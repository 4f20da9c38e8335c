"""Pallas windowed-attention kernel: parity vs the jnp reference through the
interpreter (runs on CPU), fallback routing, and gradient correctness."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deepmimic_diffusion_mujoco_tpu.models.local_attention import local_attention
from deepmimic_diffusion_mujoco_tpu.ops.pallas import local_attention_kernel as K


@pytest.fixture(autouse=True)
def interpret_mode():
    K.INTERPRET = True
    yield
    K.INTERPRET = False


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("use_rotary", [False, True])
def test_kernel_matches_jnp_reference(causal, use_rotary):
    B, h, N, dh, w = 2, 3, 256, 32, 16
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(B, h, N, dh)), jnp.float32)
               for _ in range(3))
    ref = local_attention(q, k, v, w, causal=causal, exact_windowsize=True,
                          use_rotary=use_rotary)
    ker = K.local_attention_tpu(q, k, v, w, causal, True, use_rotary)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), atol=2e-4)


def test_kernel_fallback_for_unaligned_and_xpos():
    B, h, N, dh, w = 1, 2, 96, 32, 16  # N % 128 != 0 -> fallback
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.normal(size=(B, h, N, dh)), jnp.float32)
               for _ in range(3))
    ref = local_attention(q, k, v, w, exact_windowsize=True, use_rotary=True)
    out = K.local_attention_tpu(q, k, v, w, False, True, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # xpos path always falls back (asymmetric scaling)
    ref_x = local_attention(q, k, v, w, exact_windowsize=True, use_rotary=True,
                            use_xpos=True, xpos_scale_base=8,
                            mask_window_size=w)
    out_x = K.local_attention_tpu(q, k, v, w, False, True, True, True, 8)
    # fallback computes through the same jnp path modulo mask_window_size
    assert np.isfinite(np.asarray(out_x)).all() and out_x.shape == ref_x.shape


def test_kernel_gradients_match_reference():
    B, h, N, dh, w = 1, 2, 128, 32, 16
    rng = np.random.default_rng(2)
    q, k, v = (jnp.asarray(rng.normal(size=(B, h, N, dh)), jnp.float32)
               for _ in range(3))

    def loss_ker(q, k, v):
        return (K.local_attention_tpu(q, k, v, w, False, True, True) ** 2).sum()

    def loss_ref(q, k, v):
        return (local_attention(q, k, v, w, exact_windowsize=True,
                                use_rotary=True) ** 2).sum()

    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ker, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_local_mha_use_pallas_flag():
    """LocalMHA with use_pallas routes through the dispatcher and matches."""
    from deepmimic_diffusion_mujoco_tpu.models.local_attention import LocalTransformer

    m_ref = LocalTransformer(input_dim=8, max_seq_len=128, dim=32, depth=1,
                             heads=2, dim_head=16, window_size=16)
    m_pal = LocalTransformer(input_dim=8, max_seq_len=128, dim=32, depth=1,
                             heads=2, dim_head=16, window_size=16,
                             use_pallas=True)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 128, 8)), jnp.float32)
    t = jnp.array([5])
    params = m_ref.init(jax.random.PRNGKey(0), x, t)
    a = m_ref.apply(params, x, t)
    b = m_pal.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
