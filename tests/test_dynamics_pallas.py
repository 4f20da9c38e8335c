"""Parity tests for the whole-control-step Pallas dynamics kernel.

The component-form math (dynamics_pallas.control_step_components) must be
ALGEBRAICALLY identical to the O(n) ABA engine (dynamics_aba), which chains
to the dense engine's machine-exactness vs MuJoCo mj_step; the Pallas
kernel (interpret mode on CPU) must match the component math.
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deepmimic_diffusion_mujoco_tpu.data.mocap import load_clip
from deepmimic_diffusion_mujoco_tpu.physics import dynamics_aba as aba
from deepmimic_diffusion_mujoco_tpu.physics import dynamics_lanes as DL
from deepmimic_diffusion_mujoco_tpu.physics import dynamics_pallas as dp
from deepmimic_diffusion_mujoco_tpu.physics.dynamics import PD_KD, NQ, NV

DATA = os.path.join(os.path.dirname(__file__), "..", "data", "motions")
WALK = os.path.join(DATA, "humanoid3d_walk.txt")

H = (1.0 / 30.0) / 17.0
SUBSTEPS = 2  # enough to exercise the substep carry; CPU runs are eager


@pytest.fixture(scope="module")
def walk_states():
    clip = load_clip(WALK)
    qpos = np.asarray(clip.qpos)
    qvel = np.asarray(clip.qvel)
    # a mix of frames, including ground-contact poses; target = next frame
    idx = np.asarray([0, 5, 11, 20, 27, 33, 14, 8])
    return qpos[idx], qvel[idx], qpos[(idx + 1) % len(qpos)]


def _aba_control_step(qpos, qvel, target, dtype):
    """DynamicsEnv.step's aba path, explicit (so it runs in f64 too)."""
    kd = jnp.asarray(PD_KD, dtype)
    qp_T, qv_T = qpos.T, qvel.T
    tgt_T = target.T
    for _ in range(SUBSTEPS):
        tau_T = DL.pd_torques_lanes(qp_T, qv_T, tgt_T, 1.0, 1.0)
        qp_T, qv_T = aba.step_physics_aba(
            qp_T, qv_T, tau_T, H, contacts=True, limits=True, kd_extra=kd)
    return qp_T.T, qv_T.T


def _components_control_step(qpos, qvel, target):
    """Component math on (1, N) tiles (no pallas_call)."""
    qp = [qpos[:, k][None, :] for k in range(NQ)]
    qv = [qvel[:, k][None, :] for k in range(NV)]
    tgt = [target[:, k][None, :] for k in range(NQ)]
    qp2, qv2 = dp.control_step_components(
        qp, qv, tgt, h=H, substeps=SUBSTEPS, unroll=True)
    return (jnp.stack([r[0] for r in qp2], axis=1),
            jnp.stack([r[0] for r in qv2], axis=1))


def test_component_math_matches_aba_f64(walk_states):
    """Exact-algebra check: the kernel's component formulation reproduces
    the ABA engine at 1e-8 in float64 (same recursions, different
    association only)."""
    qpos, qvel, target = walk_states
    with jax.enable_x64(True):
        qp_a, qv_a = _aba_control_step(
            jnp.asarray(qpos, jnp.float64), jnp.asarray(qvel, jnp.float64),
            jnp.asarray(target, jnp.float64), jnp.float64)
        qp_c, qv_c = _components_control_step(
            jnp.asarray(qpos, jnp.float64), jnp.asarray(qvel, jnp.float64),
            jnp.asarray(target, jnp.float64))
        np.testing.assert_allclose(
            np.asarray(qp_c), np.asarray(qp_a), atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(qv_c), np.asarray(qv_a), atol=1e-6)


def test_component_math_matches_aba_f32(walk_states):
    """f32 end-to-end: the kernel math tracks the aba engine with float-
    association drift only (the dtype the TPU kernel runs in)."""
    qpos, qvel, target = walk_states
    qpos32 = jnp.asarray(qpos, jnp.float32)
    qvel32 = jnp.asarray(qvel, jnp.float32)
    target32 = jnp.asarray(target, jnp.float32)
    qp_c, qv_c = _components_control_step(qpos32, qvel32, target32)
    qp_a, qv_a = _aba_control_step(qpos32, qvel32, target32, jnp.float32)
    np.testing.assert_allclose(np.asarray(qp_c), np.asarray(qp_a),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(qv_c), np.asarray(qv_a),
                               atol=5e-2, rtol=5e-2)


def test_tracking_reward_components_matches_env(walk_states):
    """The component-form tracking reward == env.tracking_reward (same
    Peng-et-al weights, joint geodesics, geom-mass COM, end-effectors)."""
    from deepmimic_diffusion_mujoco_tpu.physics import env as envlib

    qpos, qvel, target = walk_states
    clip = load_clip(WALK)
    rqv = np.asarray(clip.qvel)[[1, 6, 12, 21, 28, 34, 15, 9]]
    qp32 = jnp.asarray(qpos, jnp.float32)
    qv32 = jnp.asarray(qvel, jnp.float32)
    tg32 = jnp.asarray(target, jnp.float32)
    rv32 = jnp.asarray(rqv, jnp.float32)
    ref = envlib.tracking_reward(qp32, qv32, tg32, rv32)
    comp = dp.tracking_reward_components(
        [qp32[:, k][None, :] for k in range(NQ)],
        [qv32[:, k][None, :] for k in range(NV)],
        [tg32[:, k][None, :] for k in range(NQ)],
        [rv32[:, k][None, :] for k in range(NV)],
    )[0]
    np.testing.assert_allclose(np.asarray(comp), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.skipif(
    jax.default_backend() != "tpu"
    and not os.environ.get("RUN_PALLAS_INTERPRET"),
    reason="pallas_call path: compiled on TPU; interpret mode takes >20 min "
           "on CPU (set RUN_PALLAS_INTERPRET=1 to force)",
)
def test_pallas_call_matches_components_f32(walk_states):
    """The pallas_call wrapper (Mosaic-compiled on TPU) == the same
    component math, including env padding + (8, C) tile reshape round-trip.
    The math itself is covered on CPU by the two tests above."""
    qpos, qvel, target = walk_states
    on_tpu = jax.default_backend() == "tpu"
    qpos32 = jnp.asarray(qpos, jnp.float32)
    qvel32 = jnp.asarray(qvel, jnp.float32)
    target32 = jnp.asarray(target, jnp.float32)
    qp_k, qv_k = dp.control_step_pallas(
        qpos32, qvel32, target32, h=H, substeps=SUBSTEPS,
        interpret=not on_tpu, unroll=not on_tpu)
    qp_c, qv_c = _components_control_step(qpos32, qvel32, target32)
    np.testing.assert_allclose(
        np.asarray(qp_k), np.asarray(qp_c), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(qv_k), np.asarray(qv_c), atol=1e-3, rtol=1e-3)

    # fused in-kernel reward (the PhysicsTrackingEnv hot path): identical
    # post-step state + reward parity vs the XLA reward on that state
    from deepmimic_diffusion_mujoco_tpu.physics import env as envlib

    rv32 = jnp.zeros_like(qvel32)
    qp_f, qv_f, r_f = dp.control_step_pallas(
        qpos32, qvel32, target32, rv32, h=H, substeps=SUBSTEPS,
        interpret=not on_tpu, unroll=not on_tpu)
    np.testing.assert_array_equal(np.asarray(qp_f), np.asarray(qp_k))
    r_ref = envlib.tracking_reward(qp_f, qv_f, target32, rv32)
    np.testing.assert_allclose(np.asarray(r_f), np.asarray(r_ref),
                               atol=5e-5, rtol=5e-5)


def test_rollout_env_step_components_match_env_bookkeeping():
    """The fused-rollout per-step component function (_rollout_env_step)
    reproduces PhysicsTrackingEnv.step's bookkeeping — done instances
    freeze, rewards gate to 0, frame targets advance — against the aba
    engine over several control steps (VERDICT r3 item 5)."""
    from deepmimic_diffusion_mujoco_tpu.physics import env as envlib
    from deepmimic_diffusion_mujoco_tpu.physics.env import PhysicsState

    clip = load_clip(WALK)
    env = envlib.PhysicsTrackingEnv(
        clip.qpos, clip.qvel, substeps=SUBSTEPS, layout="aba")
    N, T = 6, 3
    st0 = env.reset(N, stagger=True)
    done0 = jnp.asarray([False, False, True, False, True, False])
    state = PhysicsState(st0.frame, st0.qpos, st0.qvel, done0)

    s = state
    step_rs, step_qp = [], []
    for _ in range(T):
        s, r = env.step(s)
        step_rs.append(np.asarray(r))
        step_qp.append(np.asarray(s.qpos))

    qp = [state.qpos[:, k][None, :] for k in range(NQ)]
    qv = [state.qvel[:, k][None, :] for k in range(NV)]
    dn = done0.astype(jnp.float32)[None, :]
    for t in range(T):
        frames = (state.frame + 1 + t) % env.num_frames
        tgt_f = env.motion[frames]
        rqv_f = env.vel[frames]
        tgt = [tgt_f[:, k][None, :] for k in range(NQ)]
        rqv = [rqv_f[:, k][None, :] for k in range(NV)]
        qp, qv, dn, r = dp._rollout_env_step(
            qp, qv, dn, tgt, rqv, h=env.engine.h, substeps=SUBSTEPS,
            kp_scale=1.0, kd_scale=1.0, contacts=True, limits=True,
            fall_height=env.fall_height, unroll=True)
        np.testing.assert_allclose(np.asarray(r[0]), step_rs[t],
                                   atol=2e-4, rtol=2e-4)
        qp_now = np.stack([np.asarray(c[0]) for c in qp], axis=1)
        np.testing.assert_allclose(qp_now, step_qp[t], atol=5e-5, rtol=5e-5)
    # frozen instances never moved and earned nothing
    assert (np.stack(step_rs)[:, [2, 4]] == 0.0).all()
    np.testing.assert_array_equal(step_qp[-1][[2, 4]],
                                  np.asarray(state.qpos)[[2, 4]])


@pytest.mark.skipif(
    jax.default_backend() != "tpu"
    and not os.environ.get("RUN_PALLAS_INTERPRET"),
    reason="pallas_call path: compiled on TPU; interpret mode takes >20 min "
           "on CPU (set RUN_PALLAS_INTERPRET=1 to force)",
)
def test_rollout_pallas_matches_step_scan():
    """The whole-rollout kernel == scanning env.step (both on the compiled
    pallas path): state, rewards, done and frame all agree."""
    from deepmimic_diffusion_mujoco_tpu.physics import env as envlib

    clip = load_clip(WALK)
    env = envlib.PhysicsTrackingEnv(
        clip.qpos, clip.qvel, substeps=SUBSTEPS, layout="pallas")
    state = env.reset(8, stagger=True)
    fs, rews = env.rollout(state, 3)
    s = state
    rs = []
    for _ in range(3):
        s, r = env.step(s)
        rs.append(np.asarray(r))
    np.testing.assert_allclose(np.asarray(rews), np.stack(rs),
                               atol=5e-5, rtol=5e-5)
    np.testing.assert_allclose(np.asarray(fs.qpos), np.asarray(s.qpos),
                               atol=5e-5, rtol=5e-5)
    np.testing.assert_array_equal(np.asarray(fs.done), np.asarray(s.done))
    np.testing.assert_array_equal(np.asarray(fs.frame), np.asarray(s.frame))
