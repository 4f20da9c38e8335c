"""Stack C (vanilla 1-D DDPM over a flattened normalized clip,
ddpm/ddpm.ipynb) + loss-aware timestep samplers (live resample.py rebuild)."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from deepmimic_diffusion_mujoco_tpu.data.datasets import (
    Batch,
    flattened_normalized,
    unflatten_denormalized,
)
from deepmimic_diffusion_mujoco_tpu.data.mocap import load_clip
from deepmimic_diffusion_mujoco_tpu.diffusion import (
    process,
    sampling,
    schedules,
    timestep_sampling as TS,
)
from deepmimic_diffusion_mujoco_tpu.models.temporal_unet import TemporalUnet
from deepmimic_diffusion_mujoco_tpu.train.state import TrainState

DATA = os.path.join(os.path.dirname(__file__), "..", "data", "motions")
CARTWHEEL = os.path.join(DATA, "humanoid3d_cartwheel.txt")


def test_flatten_roundtrip():
    clip = load_clip(CARTWHEEL)
    flat, bounds = flattened_normalized(clip.qpos, frames=80)
    assert flat.shape == (1, 2800, 1)
    assert 0.0 <= flat.min() and flat.max() <= 1.0
    rec = unflatten_denormalized(flat[0], bounds)
    np.testing.assert_allclose(rec, clip.qpos[:80], atol=1e-4)


@pytest.mark.slow  # ~90s full train+sample loop
def test_stack_c_train_and_sample():
    """One-channel U-Net + pred_v objective + full sample, tiny scale
    (seq 2800 // 35 smaller for test speed: use 16 frames -> 560)."""
    clip = load_clip(CARTWHEEL)
    flat, bounds = flattened_normalized(clip.qpos, frames=16)  # (1, 560, 1)
    H = flat.shape[1]
    model = TemporalUnet(transition_dim=1, dim=16)
    sched = schedules.make_schedule("cosine", timesteps=20, convention="diffuser")
    x = jnp.asarray(flat)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))

    def loss_fn(p):
        t = jnp.array([7])
        return process.v_training_loss(
            sched, lambda xx, tt: model.apply(p, xx, tt), x, t,
            jax.random.PRNGKey(1),
        )[0]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    tx = optax.adam(8e-5)
    state = TrainState.create(params, tx)
    updates, _ = tx.update(grads, state.opt_state, state.params)

    out = sampling.sample_loop(
        sched, lambda xx, tt, yy: model.apply(params, xx, tt),
        (1, H, 1), jax.random.PRNGKey(2), mode="posterior", prediction="v",
    ).trajectories
    motion = unflatten_denormalized(np.asarray(out[0]), bounds)
    assert motion.shape == (16, 35)
    assert np.isfinite(motion).all()


def test_uniform_timestep_sampler():
    t, w = TS.uniform_timesteps(jax.random.PRNGKey(0), 64, 20)
    assert t.shape == (64,) and (t >= 0).all() and (t < 20).all()
    np.testing.assert_allclose(np.asarray(w), 1.0)


def test_loss_aware_sampler_warmup_and_bias():
    T, hist = 10, 4
    state = TS.LossSecondMomentState.create(T, history=hist)
    # before warmup: uniform
    p0 = TS.loss_aware_weights(state)
    np.testing.assert_allclose(np.asarray(p0), 1.0 / T, atol=1e-6)
    # feed losses: timestep 3 consistently lossy, others tiny
    for i in range(hist):
        t = jnp.arange(T, dtype=jnp.int32)
        losses = jnp.where(t == 3, 10.0, 0.1)
        state = TS.update_with_losses(state, t, losses)
    p = np.asarray(TS.loss_aware_weights(state))
    assert p[3] > 5 * p[0]
    np.testing.assert_allclose(p.sum(), 1.0, atol=1e-5)
    t, w = TS.loss_aware_timesteps(state, jax.random.PRNGKey(0), 512)
    # lossy timestep oversampled; weights compensate (mean ~ 1 under p)
    frac3 = float((t == 3).mean())
    assert frac3 > 2.0 / T
    assert np.isfinite(np.asarray(w)).all()


def test_loss_aware_all_gather_update():
    """The distributed update path: shard (t, loss) over 8 devices and
    all_gather inside shard_map (the reference's dist.all_gather analog)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("data",))
    T, hist = 6, 2
    state = TS.LossSecondMomentState.create(T, history=hist)
    t = jnp.tile(jnp.arange(8, dtype=jnp.int32) % T, 1)
    losses = jnp.ones((8,), jnp.float32)

    def f(state, t, losses):
        return TS.update_with_losses(state, t, losses, axis_name="data")

    # after all_gather every device computes the identical update; the
    # varying-axis tracker can't infer that, hence check_vma=False
    out = shard_map(
        f, mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    )(state, t, losses)
    # every (t, loss) pair from every shard was recorded
    assert int(out.counts.sum()) == 8
