"""DDIM striding, v-parameterization, value-guided sampling."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deepmimic_diffusion_mujoco_tpu.diffusion import (
    guidance,
    process,
    sampling,
    schedules,
)
from deepmimic_diffusion_mujoco_tpu.models.temporal_unet import ValueFunction

B, H, D, T = 2, 16, 8, 50


def _sched():
    return schedules.make_schedule(kind="cosine", timesteps=T, convention="diffuser")


def test_v_roundtrip():
    s = _sched()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (B, H, D))
    eps = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    t = jnp.array([3, 40])
    xt = process.q_sample(s, x0, t, eps)
    v = process.predict_v(s, x0, t, eps)
    x0_rec = process.predict_start_from_v(s, xt, t, v)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-5)


def test_v_training_loss_finite():
    s = _sched()
    x0 = jax.random.normal(jax.random.PRNGKey(0), (B, H, D))
    t = jnp.array([5, 20])
    loss, _ = process.v_training_loss(
        s, lambda x, tt: jnp.zeros_like(x), x0, t, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss))


def test_ddim_deterministic_and_strided():
    s = _sched()

    model = lambda x, t, y: 0.1 * x
    full = sampling.sample_loop(
        s, model, (B, H, D), jax.random.PRNGKey(0), mode="ddim",
        ddim_steps=T, eta=0.0,
    ).trajectories
    # eta=0 -> fully deterministic: same rng or different rng, same chain
    full2 = sampling.sample_loop(
        s, model, (B, H, D), jax.random.PRNGKey(0), mode="ddim",
        ddim_steps=T, eta=0.0,
    ).trajectories
    np.testing.assert_allclose(np.asarray(full), np.asarray(full2))
    # strided 10-step chain is finite and close in distribution scale
    strided = sampling.sample_loop(
        s, model, (B, H, D), jax.random.PRNGKey(0), mode="ddim",
        ddim_steps=10, eta=0.0, return_chain=True,
    )
    assert strided.chain.shape[0] == 10
    assert np.isfinite(np.asarray(strided.trajectories)).all()
    # x0-prediction parameterization also works with ddim
    out_x0 = sampling.sample_loop(
        s, model, (B, H, D), jax.random.PRNGKey(0), mode="ddim",
        ddim_steps=10, prediction="x0",
    ).trajectories
    assert np.isfinite(np.asarray(out_x0)).all()


def test_ddim_full_matches_posterior_statistics():
    """DDIM with eta=1 and full steps is DDPM-like: compare magnitudes."""
    s = _sched()
    model = lambda x, t, y: 0.1 * x
    post = sampling.sample_loop(
        s, model, (8, H, D), jax.random.PRNGKey(0), mode="posterior"
    ).trajectories
    ddim = sampling.sample_loop(
        s, model, (8, H, D), jax.random.PRNGKey(0), mode="ddim", eta=1.0
    ).trajectories
    ratio = float(jnp.std(ddim) / jnp.std(post))
    assert 0.5 < ratio < 2.0, ratio


def test_value_guidance_moves_toward_high_value():
    """A value model rewarding positive dim 0 should push samples up."""
    s = _sched()
    model = lambda x, t: jnp.zeros_like(x)  # eps-model: pure denoise

    def value_fn(x, t):
        return x[..., 0].sum(axis=-1)

    guided, values = guidance.guided_sample_loop(
        s, model, value_fn, (4, H, D), jax.random.PRNGKey(0),
        scale=0.5, n_guide_steps=2,
    )
    free = sampling.sample_loop(
        s, lambda x, t, y: jnp.zeros_like(x), (4, H, D), jax.random.PRNGKey(0),
        mode="posterior",
    ).trajectories
    assert float(guided.trajectories[..., 0].mean()) > float(free[..., 0].mean())
    # sorted descending by value
    v = np.asarray(values)
    assert (np.diff(v) <= 1e-6).all()


def test_value_function_model():
    m = ValueFunction(transition_dim=D, dim=32, dim_mults=(1, 2))
    x = jnp.zeros((2, 32, D))
    params = m.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)))
    out = m.apply(params, x, jnp.array([0.0, 1.0]))
    assert out.shape == (2,)
