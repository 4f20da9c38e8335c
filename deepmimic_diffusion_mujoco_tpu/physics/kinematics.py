"""Batched forward kinematics for the DeepMimic humanoid, pure JAX.

The TPU-native replacement for the reference's only physics use —
`MjSim.forward()` kinematic playback (mocap_player.py:31, mocap_v2.py:386).
The tree is static and tiny (14 bodies), so FK is an unrolled sequence of
quaternion ops that XLA fuses into one kernel; under `jax.vmap` thousands
of env instances evaluate in lockstep (BASELINE north-star: >=10k
env-steps/s/chip).

Exactness: validated against the installed MuJoCo C engine on the generated
XML (tests/test_physics.py) — body positions/orientations agree to ~1e-6.

Conventions: quaternions are wxyz (MuJoCo order). A hinge with anchor `p`
and axis `a` contributes the local transform T(p) R(a, theta) T(-p);
multiple hinges in one body compose in declaration order (matching
mj_kinematics' sequential joint application).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.skeleton import QPOS_JOINT_SLICES
from .humanoid_model import BODIES, BODY_INDEX, END_EFFECTOR_BODIES, TOTAL_MASS


def quat_mul(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    w1, x1, y1, z1 = jnp.moveaxis(q, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(r, -1, 0)
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q (wxyz)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    half = angle * 0.5
    return jnp.concatenate(
        [jnp.cos(half)[..., None], jnp.sin(half)[..., None] * axis], axis=-1
    )


class FKResult(NamedTuple):
    body_pos: jnp.ndarray    # (..., n_bodies, 3) world positions
    body_quat: jnp.ndarray   # (..., n_bodies, 4) world orientations
    com: jnp.ndarray         # (..., 3) whole-body center of mass
    end_effectors: jnp.ndarray  # (..., 4, 3) wrists + feet world positions


def _static_tables():
    offsets, axes, anchors, geom_mass, geom_com, geom_body = [], [], [], [], [], []
    for b in BODIES:
        offsets.append(b.offset)
        for g in b.geoms:
            geom_mass.append(g.mass)
            geom_com.append(g.com)
            geom_body.append(BODY_INDEX[b.name])
    return (
        np.asarray(offsets, np.float32),
        np.asarray(geom_mass, np.float32),
        np.asarray(geom_com, np.float32),
        np.asarray(geom_body, np.int32),
    )


_OFFSETS, _GMASS, _GCOM, _GBODY = _static_tables()
_EE_IDX = np.asarray([BODY_INDEX[n] for n in END_EFFECTOR_BODIES], np.int32)
_EE_PTS = np.asarray(
    [BODIES[BODY_INDEX[n]].end_effector for n in END_EFFECTOR_BODIES], np.float32
)


def forward_kinematics(qpos: jnp.ndarray) -> FKResult:
    """qpos (..., 35) -> world-frame body poses, COM, end-effectors."""
    root_pos = qpos[..., 0:3]
    root_quat = qpos[..., 3:7]
    root_quat = root_quat / jnp.linalg.norm(root_quat, axis=-1, keepdims=True)

    pos = [None] * len(BODIES)
    quat = [None] * len(BODIES)
    pos[0] = root_pos
    quat[0] = root_quat

    for bi, b in enumerate(BODIES[1:], start=1):
        sl = QPOS_JOINT_SLICES[b.name]
        angles = qpos[..., sl]
        # fold the body's hinges in declaration order:
        # M = prod_i T(p_i) R_i T(-p_i) -> (q_local, t_local)
        q_local = jnp.broadcast_to(
            jnp.asarray([1.0, 0.0, 0.0, 0.0], qpos.dtype), root_quat.shape
        )
        t_local = jnp.zeros_like(root_pos)
        for k, hinge in enumerate(b.joints):
            axis = jnp.asarray(hinge.axis, qpos.dtype)
            anchor = jnp.asarray(hinge.pos, qpos.dtype)
            qk = quat_from_axis_angle(axis, angles[..., k])
            tk = anchor - quat_rotate(qk, anchor)
            t_local = t_local + quat_rotate(q_local, tk)
            q_local = quat_mul(q_local, qk)

        parent = BODY_INDEX[b.parent]
        offset = jnp.asarray(b.offset, qpos.dtype)
        pos[bi] = pos[parent] + quat_rotate(quat[parent], offset + t_local)
        quat[bi] = quat_mul(quat[parent], q_local)

    body_pos = jnp.stack(pos, axis=-2)
    body_quat = jnp.stack(quat, axis=-2)

    gpos = body_pos[..., _GBODY, :] + quat_rotate(
        body_quat[..., _GBODY, :], jnp.asarray(_GCOM)
    )
    com = (gpos * jnp.asarray(_GMASS)[:, None]).sum(-2) / TOTAL_MASS

    ee = body_pos[..., _EE_IDX, :] + quat_rotate(
        body_quat[..., _EE_IDX, :], jnp.asarray(_EE_PTS)
    )
    return FKResult(body_pos, body_quat, com, ee)


@jax.jit
def forward_kinematics_batch(qpos: jnp.ndarray) -> FKResult:
    """vmapped-over-leading-axes FK (shape-polymorphic via broadcasting)."""
    return forward_kinematics(qpos)


def quat_from_euler_rxyz(euler: jnp.ndarray) -> jnp.ndarray:
    """Intrinsic-xyz Euler triple -> wxyz quaternion (the mocap joint
    convention, utils/rotations.py host-side twin)."""
    ex = quat_from_axis_angle(jnp.asarray([1.0, 0, 0]), euler[..., 0])
    ey = quat_from_axis_angle(jnp.asarray([0, 1.0, 0]), euler[..., 1])
    ez = quat_from_axis_angle(jnp.asarray([0, 0, 1.0]), euler[..., 2])
    return quat_mul(ex, quat_mul(ey, ez))


def quat_geodesic_angle(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Angle of the relative rotation between two quaternions."""
    dot = jnp.clip(jnp.abs((q1 * q2).sum(-1)), 0.0, 1.0)
    return 2.0 * jnp.arccos(dot)
