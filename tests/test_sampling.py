"""Reverse-chain sampler: full-chain golden parity vs both reference loops
with injected noise, plus conditioning-behavior checks.

Parity method: both the torch oracle and our sampler draw the same number of
gaussians in the same order (init, then one per step). We pre-generate that
sequence and monkeypatch `torch.randn`/`torch.randn_like` on the reference
side and `jax.random.normal` on ours (under `jax.disable_jit`, where the scan
runs eagerly), making the chains bit-comparable.
"""
from collections import deque

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import _reference_oracle as oracle
from deepmimic_diffusion_mujoco_tpu.diffusion import (
    conditioning,
    sampling,
    schedules,
)

requires_ref = pytest.mark.skipif(not oracle.available(), reason="no reference")

B, H, D, T = 2, 16, 35, 20


def _noise_bank(n, shape, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.normal(size=shape).astype(np.float32) for _ in range(n)]


class _JaxNoisePatch:
    """Replace jax.random.normal in the sampling module with a deque pop."""

    def __init__(self, monkeypatch, bank):
        self.q = deque(np.asarray(b) for b in bank)
        real_normal = jax.random.normal

        def fake_normal(key, shape=(), dtype=jnp.float32):
            if tuple(shape) == (B, H, D):
                return jnp.asarray(self.q.popleft(), dtype)
            return real_normal(key, shape, dtype)

        monkeypatch.setattr(sampling.jax.random, "normal", fake_normal)


def _patch_torch_noise(monkeypatch, torch, bank):
    q = deque(bank)

    def fake_randn(*shape, **kw):
        if shape and isinstance(shape[0], (tuple, torch.Size)):
            shape = tuple(shape[0])
        assert shape == (B, H, D)
        return torch.tensor(q.popleft())

    monkeypatch.setattr(torch, "randn", fake_randn)
    monkeypatch.setattr(torch, "randn_like", lambda x, **kw: torch.tensor(q.popleft()))
    return q


@requires_ref
@pytest.mark.parametrize("use_cond", [False, True])
def test_stack_a_chain_parity(monkeypatch, use_cond):
    import torch

    oracle.ref_diffuser_package()
    from diffuser.models import sampling_config
    from diffuser.models.diffusion import GaussianDiffusion

    class EpsModel(torch.nn.Module):
        def forward(self, x, cond, t):
            return 0.1 * x  # deterministic stand-in denoiser

    ref = GaussianDiffusion(
        EpsModel(), horizon=H, transition_dim=D, n_timesteps=T,
        clip_denoised=True, predict_epsilon=True,
    )

    cond_fn_ref = (
        sampling_config.apply_conditioning_motion_editing
        if use_cond
        else sampling_config.apply_conditioning
    )
    bank = _noise_bank(T + 1, (B, H, D))
    _patch_torch_noise(monkeypatch, torch, [b.copy() for b in bank])
    with torch.no_grad():
        ref_out = ref.p_sample_loop(
            (B, H, D), cond=None, verbose=False, conditioning_fn=cond_fn_ref
        ).trajectories.numpy()

    _JaxNoisePatch(monkeypatch, bank)
    cond_fn = conditioning.holding_box(D) if use_cond else None
    sched = schedules.make_schedule(kind="cosine", timesteps=T, convention="diffuser")
    with jax.disable_jit():
        out = sampling.sample_loop(
            sched,
            lambda x, t, y: 0.1 * x,
            (B, H, D),
            jax.random.PRNGKey(0),
            mode="posterior",
            predict_epsilon=True,
            clip_denoised=True,
            conditioning_fn=cond_fn,
        ).trajectories
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4)
    if use_cond:
        # the reference's own verification: shoulders exactly 0, elbows 1.57
        o = np.asarray(out)
        assert np.abs(o[:, :, 13:16]).max() == 0.0
        assert np.abs(o[:, :, 17:20]).max() == 0.0
        np.testing.assert_allclose(o[:, :, 16], 1.57)
        np.testing.assert_allclose(o[:, :, 20], 1.57)


@requires_ref
def test_stack_a_starting_motion_and_max_timesteps(monkeypatch):
    import torch

    oracle.ref_diffuser_package()
    from diffuser.models.diffusion import GaussianDiffusion

    class EpsModel(torch.nn.Module):
        def forward(self, x, cond, t):
            return 0.1 * x

    ref = GaussianDiffusion(
        EpsModel(), horizon=H, transition_dim=D, n_timesteps=T, clip_denoised=True
    )
    start = np.random.default_rng(3).normal(size=(B, H, D)).astype(np.float32)
    bank = _noise_bank(2, (B, H, D), seed=4)  # 2 reverse steps, no init draw
    _patch_torch_noise(monkeypatch, torch, [b.copy() for b in bank])
    with torch.no_grad():
        ref_out = ref.p_sample_loop(
            (B, H, D), cond=None, verbose=False,
            starting_motion=torch.tensor(start), max_timesteps=2,
        ).trajectories.numpy()

    _JaxNoisePatch(monkeypatch, bank)
    sched = schedules.make_schedule(kind="cosine", timesteps=T, convention="diffuser")
    with jax.disable_jit():
        out = sampling.sample_loop(
            sched, lambda x, t, y: 0.1 * x, (B, H, D), jax.random.PRNGKey(0),
            mode="posterior", clip_denoised=True,
            starting_motion=jnp.asarray(start), t_start=2,
        ).trajectories
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4)


@requires_ref
@pytest.mark.parametrize("predict_x0,cfg", [(True, 0.0), (False, 0.0), (True, 3.0)])
def test_v4_chain_parity(monkeypatch, predict_x0, cfg):
    import torch

    v4mod = oracle.load_module("diffuser/models/diffusion_v4.py", "ref_v4_s")
    ref = v4mod.DiffusionV4(
        noise_steps=T, beta_start=1e-4, beta_end=0.02, joint_dim=D, frames=H,
        device="cpu", schedule_type="cosine", predict_x0=predict_x0,
        cfg_scale=cfg,
    )

    class RefModel(torch.nn.Module):
        def forward(self, x, t, y):
            return 0.1 * x if y is None else 0.2 * x

    bank = _noise_bank(1 + (T - 2), (B, H, D), seed=7)  # init + steps T-1..2
    _patch_torch_noise(monkeypatch, torch, [b.copy() for b in bank])
    y_t = torch.zeros(B, dtype=torch.long) if cfg > 0 else None
    ref_out = ref.sample(RefModel(), B, y=y_t).numpy()

    # our scan draws (then zeroes) noise on the final step too; the torch
    # loop never draws it — pad one unused entry so the sequences align
    _JaxNoisePatch(monkeypatch, bank + [np.zeros((B, H, D), np.float32)])
    sched = schedules.make_schedule(kind="cosine", timesteps=T, convention="v4")

    def model_fn(x, t, y):
        # mirror RefModel: unconditional (None / null label -1) -> 0.1x.
        # Per-sample branch (like a real label-embedding model) so it also
        # works under the batched-CFG path where cond/uncond share one call.
        if y is None:
            return 0.1 * x
        return jnp.where((y < 0)[:, None, None], 0.1 * x, 0.2 * x)

    with jax.disable_jit():
        out = sampling.sample_loop(
            sched, model_fn, (B, H, D), jax.random.PRNGKey(0),
            mode="v4", predict_epsilon=not predict_x0,
            cfg_scale=cfg if cfg > 0 else None,
            y=jnp.zeros((B,), jnp.int32) if cfg > 0 else None,
            uncond_y=jnp.full((B,), -1, jnp.int32) if cfg > 0 else None,
        ).trajectories
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4)


def test_cfg_batched_matches_sequential():
    """The 2B-stacked CFG forward (TPU default) must equal the reference's
    two-sequential-forwards form on a real label-conditioned denoiser."""
    from deepmimic_diffusion_mujoco_tpu.models.transformer import (
        TransformerMotionModel,
    )

    model = TransformerMotionModel(
        input_dim=D, latent_dim=32, num_layers=1, n_heads=2,
        num_classes=3,
    )
    x = jnp.zeros((B, H, D))
    params = model.init(
        jax.random.PRNGKey(0), x, jnp.zeros((B,)), jnp.zeros((B,), jnp.int32)
    )

    def model_fn(xx, tt, yy):
        return model.apply(params, xx, tt, yy)

    sched = schedules.make_schedule(kind="cosine", timesteps=T, convention="v4")
    kw = dict(
        mode="v4", predict_epsilon=False, cfg_scale=2.5,
        y=jnp.ones((B,), jnp.int32),
        uncond_y=jnp.full((B,), 3, jnp.int32),  # null label = num_classes
    )
    out_b = sampling.sample_loop(
        sched, model_fn, (B, H, D), jax.random.PRNGKey(0),
        cfg_batched=True, **kw,
    ).trajectories
    out_s = sampling.sample_loop(
        sched, model_fn, (B, H, D), jax.random.PRNGKey(0),
        cfg_batched=False, **kw,
    ).trajectories
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_s),
                               atol=1e-4, rtol=1e-4)


def test_chain_and_shapes():
    sched = schedules.make_schedule(kind="cosine", timesteps=T, convention="diffuser")
    out = sampling.sample_loop(
        sched, lambda x, t, y: 0.1 * x, (B, H, D), jax.random.PRNGKey(0),
        mode="posterior", return_chain=True,
    )
    assert out.trajectories.shape == (B, H, D)
    assert out.chain.shape == (T, B, H, D)
    # v4 mode runs T-1 steps (never t=0 — reference quirk)
    out_v4 = sampling.sample_loop(
        sched, lambda x, t, y: 0.1 * x, (B, H, D), jax.random.PRNGKey(0),
        mode="v4", return_chain=True,
    )
    assert out_v4.chain.shape == (T - 1, B, H, D)


def test_conditioners():
    x = jnp.zeros((1, 8, D)) + 5.0
    # clamp_dims
    fn = conditioning.clamp_dims({2: 1.5}, D)
    y = fn(x)
    assert float(y[0, 3, 2]) == 1.5 and float(y[0, 3, 3]) == 5.0
    # clamp_frame0
    f0 = jnp.arange(D, dtype=jnp.float32)[None]
    y = conditioning.clamp_frame0(f0)(x)
    np.testing.assert_allclose(np.asarray(y[0, 0]), np.asarray(f0[0]))
    np.testing.assert_allclose(np.asarray(y[0, 1]), 5.0)
    # inbetween: middle stays free
    start = np.ones((8, D), np.float32)
    end = 2 * np.ones((8, D), np.float32)
    y = conditioning.inbetween(start, end, horizon=8, edge=2)(x)
    assert float(y[0, 0, 0]) == 1.0 and float(y[0, 7, 0]) == 2.0
    assert float(y[0, 4, 0]) == 5.0
    # blend: returns concatenated start motion with root continuity
    a = np.zeros((6, D), np.float32)
    a[:, 0] = np.arange(6)
    b = np.zeros((4, D), np.float32)
    sm, fn = conditioning.blend(a, b, seam_halfwidth=1)
    assert sm.shape == (10, D)
    assert sm[6, 0] == 5.0  # second clip shifted to end of first
    # steer_root overwrites only dims 0,1 of listed frames
    path = np.stack([np.arange(4), np.arange(4)], axis=1).astype(np.float32)
    y = conditioning.steer_root(path, horizon=8, feature_dim=D)(x)
    assert float(y[0, 2, 0]) == 2.0 and float(y[0, 2, 2]) == 5.0
    assert float(y[0, 5, 0]) == 5.0
