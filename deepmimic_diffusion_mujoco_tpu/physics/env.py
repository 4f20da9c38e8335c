"""Vectorized humanoid environments + DeepMimic tracking reward.

The reference's only environment is a host-side kinematic playback loop
(mocap_player.py:7-39: qpos[:] = frame; sim.forward(); render) with a
phase-offset wraparound carrying the root xy across loops
(mocap_player.py:35-37,76-79). Here that loop becomes a jitted, vmapped
device program stepping thousands of instances in lockstep (north-star
config 5: 4096 envs), plus the DeepMimic tracking-reward stack the
reference inherited constants for but never implemented
(PARAMS_KP_KD / JOINT_WEIGHT, utils/mocap_util.py:22-29).

Two modes:

- KinematicEnv: `step` advances the mocap frame (wraparound + root-xy phase
  carry) and runs FK — the playback/eval path, exact vs the MuJoCo oracle.
- PDPhysicsEnv: semi-implicit Euler on joint coordinates with DeepMimic PD
  actuators toward a target pose, per-DOF diagonal inertia approximation,
  viscous damping, gravity on the root, and a ground clamp. This is an
  APPROXIMATE dynamics model (documented; the reference has no forward
  dynamics at all — mj_step is never called, README.md:46 admits playback
  is "not physically accurate"), intended for reward-shaping experiments;
  tracking-reward numbers are validated statistically, not bitwise.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.skeleton import (
    BODY_JOINTS,
    DOF_DEF,
    JOINT_WEIGHT,
    PARAMS_KP_KD,
    QPOS_JOINT_SLICES,
    QPOS_DIM,
    QVEL_DIM,
)
from .kinematics import (
    forward_kinematics,
    quat_from_euler_rxyz,
    quat_geodesic_angle,
)

# ---------------------------------------------------------------------------
# DeepMimic tracking reward (Peng et al. 2018 weights)
# ---------------------------------------------------------------------------

_JOINT_W = np.asarray([JOINT_WEIGHT[j] for j in BODY_JOINTS], np.float32)
_JOINT_W = _JOINT_W / _JOINT_W.sum()


def _joint_quats(qpos):
    """Per-joint rotations as quaternions: (..., 12, 4)."""
    quats = []
    for j in BODY_JOINTS:
        sl = QPOS_JOINT_SLICES[j]
        if DOF_DEF[j] == 3:
            quats.append(quat_from_euler_rxyz(qpos[..., sl]))
        else:
            ang = qpos[..., sl][..., 0]
            half = ang * 0.5
            z = jnp.zeros_like(half)
            # hinge about -y (elbows/knees): sign only flips the geodesic
            # direction, not the angle magnitude used by the reward
            quats.append(jnp.stack([jnp.cos(half), z, -jnp.sin(half), z], -1))
    return jnp.stack(quats, axis=-2)


def tracking_reward(
    qpos, qvel, ref_qpos, ref_qvel,
    w_pose: float = 0.65, w_vel: float = 0.1, w_ee: float = 0.15,
    w_com: float = 0.1,
) -> jnp.ndarray:
    """DeepMimic reward: weighted product-of-exponentials over pose error,
    velocity error, end-effector error and COM error."""
    q = _joint_quats(qpos)
    q_ref = _joint_quats(ref_qpos)
    ang = quat_geodesic_angle(q, q_ref)                    # (..., 12)
    pose_err = (jnp.asarray(_JOINT_W) * ang ** 2).sum(-1)

    vel_err = ((qvel[..., 6:] - ref_qvel[..., 6:]) ** 2).mean(-1)

    fk = forward_kinematics(qpos)
    fk_ref = forward_kinematics(ref_qpos)
    ee_err = ((fk.end_effectors - fk_ref.end_effectors) ** 2).sum(-1).mean(-1)
    com_err = ((fk.com - fk_ref.com) ** 2).sum(-1)

    r_pose = jnp.exp(-2.0 * pose_err)
    r_vel = jnp.exp(-0.1 * vel_err)
    r_ee = jnp.exp(-40.0 * ee_err)
    r_com = jnp.exp(-10.0 * com_err)
    return w_pose * r_pose + w_vel * r_vel + w_ee * r_ee + w_com * r_com


# ---------------------------------------------------------------------------
# Kinematic playback env (vectorized mocap_player)
# ---------------------------------------------------------------------------


class EnvState(NamedTuple):
    frame: jnp.ndarray         # (N,) int32 current frame index
    phase_offset: jnp.ndarray  # (N, 3) root offset carried across loops
    qpos: jnp.ndarray          # (N, 35)
    qvel: jnp.ndarray          # (N, 34)


class KinematicEnv:
    """N instances playing a mocap clip in lockstep under jit."""

    def __init__(self, qpos_clip: np.ndarray, qvel_clip: np.ndarray | None = None):
        self.motion = jnp.asarray(qpos_clip, jnp.float32)        # (T, 35)
        self.vel = (
            jnp.asarray(qvel_clip, jnp.float32)
            if qvel_clip is not None
            else jnp.zeros((qpos_clip.shape[0], QVEL_DIM), jnp.float32)
        )
        self.num_frames = self.motion.shape[0]

    def reset(self, n: int, stagger: bool = True) -> EnvState:
        """Instances optionally staggered across the clip's phase."""
        frame = (
            (jnp.arange(n) * self.num_frames // max(n, 1)) % self.num_frames
            if stagger
            else jnp.zeros((n,), jnp.int32)
        ).astype(jnp.int32)
        qpos = self.motion[frame]
        return EnvState(
            frame=frame,
            phase_offset=jnp.zeros((n, 3), jnp.float32),
            qpos=qpos,
            qvel=self.vel[frame],
        )

    @partial(jax.jit, static_argnums=0)
    def step(self, state: EnvState):
        """Advance one frame; on wraparound carry the root xy offset so the
        character keeps moving forward (mocap_player.py:76-79). Returns
        (state, fk, reward): FK runs every step (the sim.forward analog)
        and reward is tracking vs. the raw clip."""
        nxt = state.frame + 1
        wrapped = nxt >= self.num_frames
        nxt = jnp.where(wrapped, 0, nxt)
        # offset += (last_frame_root - first_frame_root), z zeroed
        delta = self.motion[-1, 0:3] - self.motion[0, 0:3]
        delta = delta.at[2].set(0.0)
        phase = state.phase_offset + jnp.where(wrapped[:, None], delta[None], 0.0)
        qpos = self.motion[nxt]
        qpos = qpos.at[:, 0:3].add(phase)
        qvel = self.vel[nxt]
        fk = forward_kinematics(qpos)
        # reference pose shares the phase carry: after wraparound the clip's
        # root xy is offset too, otherwise the end-effector/COM reward terms
        # would see a spurious whole-body translation error
        ref_qpos = self.motion[nxt].at[:, 0:3].add(phase)
        reward = tracking_reward(qpos, qvel, ref_qpos, self.vel[nxt])
        return EnvState(nxt, phase, qpos, qvel), fk, reward


# ---------------------------------------------------------------------------
# PD physics env (approximate forward dynamics)
# ---------------------------------------------------------------------------

_KP = np.zeros((QPOS_DIM,), np.float32)
_KD = np.zeros((QVEL_DIM,), np.float32)
for _j in BODY_JOINTS:
    _kp, _kd = PARAMS_KP_KD[_j]
    _KP[QPOS_JOINT_SLICES[_j]] = _kp
    _s = QPOS_JOINT_SLICES[_j]
    _KD[_s.start - 1 : _s.stop - 1] = _kd  # qvel index = qpos index - 1


class PDPhysicsEnv:
    """Joint-space semi-implicit Euler with DeepMimic PD gains.

    qacc_j = (kp*(target - q) - kd*qdot) / I_j - damping*qdot; root gets
    gravity + a ground clamp at the spec's standing height. Diagonal
    inertia I_j is a documented approximation (see module docstring).
    """

    def __init__(self, dt: float = 1.0 / 30.0, substeps: int = 15,
                 inertia: float = 4.0, damping: float = 2.0):
        self.dt = dt
        self.substeps = substeps
        self.h = dt / substeps
        self.inertia = inertia
        self.damping = damping

    @partial(jax.jit, static_argnums=0)
    def step(self, qpos, qvel, target_qpos):
        kp = jnp.asarray(_KP)[7:]
        kd = jnp.asarray(_KD)[6:]

        def sub(carry, _):
            qp, qv = carry
            tau = kp * (target_qpos[..., 7:] - qp[..., 7:]) - kd * qv[..., 6:]
            qacc = tau / self.inertia - self.damping * qv[..., 6:]
            qv_j = qv[..., 6:] + self.h * qacc
            # root: gravity, no actuation (free joint)
            root_lin = qv[..., 0:3] + self.h * jnp.asarray([0.0, 0.0, -9.81])
            qv = jnp.concatenate([root_lin, qv[..., 3:6], qv_j], -1)
            root_pos = qp[..., 0:3] + self.h * qv[..., 0:3]
            # ground clamp: keep the pelvis above standing height * 0.4
            floor = 0.4
            hit = root_pos[..., 2] < floor
            root_pos = root_pos.at[..., 2].set(jnp.maximum(root_pos[..., 2], floor))
            qv = qv.at[..., 2].set(jnp.where(hit, 0.0, qv[..., 2]))
            joints = qp[..., 7:] + self.h * qv[..., 6:]
            qp = jnp.concatenate([root_pos, qp[..., 3:7], joints], -1)
            return (qp, qv), None

        (qpos, qvel), _ = jax.lax.scan(sub, (qpos, qvel), None, length=self.substeps)
        return qpos, qvel
