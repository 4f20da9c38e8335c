"""Denoiser model zoo: golden parity for windowed attention vs the
reference's pure-torch LocalAttention, plus shape/behavior tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import _reference_oracle as oracle
from deepmimic_diffusion_mujoco_tpu.models import local_attention as la
from deepmimic_diffusion_mujoco_tpu.models.temporal_unet import TemporalUnet
from deepmimic_diffusion_mujoco_tpu.models.transformer import TransformerMotionModel
from deepmimic_diffusion_mujoco_tpu.models.transformer_decoder import (
    TransformerDecoderMotionModel,
)

requires_ref = pytest.mark.skipif(not oracle.available(), reason="no reference")


@requires_ref
@pytest.mark.parametrize(
    "causal,use_rotary,n,w",
    [
        (False, False, 32, 8),
        (True, False, 32, 8),
        (False, True, 32, 8),
        (False, True, 30, 8),   # autopad path
        (True, True, 64, 16),
    ],
)
def test_local_attention_parity(causal, use_rotary, n, w):
    import torch

    oracle.ref_diffuser_package()
    from diffuser.models.local_attention import LocalAttention

    B, h, dh = 2, 3, 32
    rng = np.random.default_rng(0)
    q, k, v = (rng.normal(size=(B, h, n, dh)).astype(np.float32) for _ in range(3))

    ref_attn = LocalAttention(
        window_size=w, causal=causal, autopad=True, exact_windowsize=True,
        dim=dh if use_rotary else None, use_rotary_pos_emb=use_rotary,
    )
    with torch.no_grad():
        ref_out = ref_attn(torch.tensor(q), torch.tensor(k), torch.tensor(v)).numpy()

    out = la.local_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), w,
        causal=causal, exact_windowsize=True, use_rotary=use_rotary,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5)


@requires_ref
def test_local_attention_xpos_window_extrapolation_parity():
    import torch

    oracle.ref_diffuser_package()
    from diffuser.models.local_attention import LocalAttention

    B, h, n, dh, w_train, w_eval = 1, 2, 64, 32, 8, 16
    rng = np.random.default_rng(1)
    q, k, v = (rng.normal(size=(B, h, n, dh)).astype(np.float32) for _ in range(3))
    ref_attn = LocalAttention(
        window_size=w_train, causal=True, autopad=True, exact_windowsize=True,
        dim=dh, use_xpos=True,
    )
    with torch.no_grad():
        ref_out = ref_attn(
            torch.tensor(q), torch.tensor(k), torch.tensor(v), window_size=w_eval
        ).numpy()
    out = la.local_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), w_eval,
        causal=True, exact_windowsize=True, use_rotary=True, use_xpos=True,
        xpos_scale_base=w_train // 2, mask_window_size=w_train,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5)


def test_local_attention_key_mask():
    """Padded keys must receive zero attention weight."""
    B, h, n, dh, w = 1, 1, 16, 8, 4
    rng = np.random.default_rng(2)
    q, k = (jnp.asarray(rng.normal(size=(B, h, n, dh)), jnp.float32) for _ in range(2))
    v = jnp.ones((B, h, n, dh))
    # mark last 4 positions invalid with huge values in v: output must not see them
    v = v.at[:, :, 12:].set(1e6)
    key_mask = jnp.asarray(np.r_[np.ones(12), np.zeros(4)][None], jnp.float32)
    out = la.local_attention(q, k, v, w, key_mask=key_mask, use_rotary=False)
    assert np.abs(np.asarray(out[:, :, :12])).max() < 100.0


def test_transformer_shapes_and_cfg_classes():
    m = TransformerMotionModel(
        input_dim=69, latent_dim=64, n_heads=4, num_layers=2,
        dim_feedforward=128, max_sequence_length=64, num_classes=9,
    )
    x = jnp.zeros((2, 40, 69))
    t = jnp.array([3, 7])
    params = m.init(jax.random.PRNGKey(0), x, t)
    out_cond = m.apply(params, x, t, y=jnp.array([1, 2]))
    out_null = m.apply(params, x, t, y=jnp.array([9, 9]))
    out_none = m.apply(params, x, t)
    assert out_cond.shape == (2, 40, 69)
    # null label == y=None (the CFG unconditional branch)
    np.testing.assert_allclose(np.asarray(out_null), np.asarray(out_none))
    assert np.abs(np.asarray(out_cond) - np.asarray(out_null)).max() > 0


def test_transformer_padding_mask_blocks_padded_keys():
    m = TransformerMotionModel(
        input_dim=8, latent_dim=32, n_heads=2, num_layers=1,
        dim_feedforward=64, max_sequence_length=16,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 12, 8)), jnp.float32)
    t = jnp.array([5])
    params = m.init(jax.random.PRNGKey(0), x, t)
    mask = jnp.asarray(np.r_[np.ones(8), np.zeros(4)][None], jnp.float32)
    base = m.apply(params, x, t, mask=mask)
    # perturbing a padded frame must not change valid-frame outputs
    x2 = x.at[0, 10].set(99.0)
    pert = m.apply(params, x2, t, mask=mask)
    np.testing.assert_allclose(np.asarray(base[0, :8]), np.asarray(pert[0, :8]), atol=1e-5)


def test_local_transformer_forward():
    m = la.LocalTransformer(
        input_dim=69, max_seq_len=64, dim=64, depth=2, heads=2, dim_head=16,
        window_size=8, num_classes=9,
    )
    x = jnp.zeros((2, 40, 69))
    t = jnp.array([3, 7])
    params = m.init(jax.random.PRNGKey(0), x, t)
    out = m.apply(params, x, t, y=jnp.array([0, 9]))
    assert out.shape == (2, 40, 69)
    # horizon elasticity: different length, same params
    out2 = m.apply(params, jnp.zeros((1, 24, 69)), jnp.array([1]))
    assert out2.shape == (1, 24, 69)


def test_decoder_model_forward():
    m = TransformerDecoderMotionModel(
        horizon=32, transition_dim=35, dim=64, n_heads=4, num_layers=2,
        n_timesteps=50,
    )
    x = jnp.zeros((2, 32, 35))
    t = jnp.array([3, 7])
    params = m.init(jax.random.PRNGKey(0), x, t)
    out = m.apply(params, x, t)
    assert out.shape == (2, 32, 35)


def test_temporal_unet_time_dependence():
    m = TemporalUnet(transition_dim=35, dim=16)
    x = jnp.ones((1, 16, 35))
    params = m.init(jax.random.PRNGKey(0), x, jnp.array([0.0]))
    a = m.apply(params, x, jnp.array([0.0]))
    b = m.apply(params, x, jnp.array([40.0]))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4
