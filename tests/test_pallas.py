"""Pallas windowed-attention kernel: parity vs the jnp reference through the
interpreter (runs on CPU), fallback routing, and gradient correctness."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deepmimic_diffusion_mujoco_tpu.models.local_attention import local_attention
from deepmimic_diffusion_mujoco_tpu.ops.pallas import local_attention_kernel as K
from deepmimic_diffusion_mujoco_tpu.ops.pallas import fused_local_attention as FK


@pytest.fixture(autouse=True)
def interpret_mode():
    K.INTERPRET = True
    FK.INTERPRET = True
    yield
    K.INTERPRET = False
    FK.INTERPRET = False


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


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("use_rotary", [False, True])
def test_fused_qkv_kernel_matches_jnp_reference(causal, use_rotary):
    """Round-2 fused kernel: all heads in one program, natural qkv layout."""
    B, h, N, dh, w = 2, 3, 256, 32, 16
    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * h * dh)), jnp.float32)
    ref = FK._jnp_reference(qkv, h, dh, w, causal, True, use_rotary)
    ker = FK.fused_qkv_local_attention(qkv, h, dh, w, causal, True, use_rotary)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), atol=2e-4)


@pytest.mark.parametrize("N,w", [
    (128, 16),   # nc == 1: single-block kernel
    (256, 64),   # P == C (2w == C): whole-neighbor slices
    (384, 32),   # P == 64 < C: tight 2w slices
    (256, 8),    # P == 16, smallest aligned slice
])
def test_fused_qkv_kernel_chunking_paths(N, w):
    """Every chunking strategy (single block / tight slices / full blocks)
    must agree with the jnp reference."""
    B, h, dh = 2, 2, 32
    rng = np.random.default_rng(13)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * h * dh)), jnp.float32)
    ref = FK._jnp_reference(qkv, h, dh, w, False, True, True)
    ker = FK.fused_qkv_local_attention(qkv, h, dh, w, False, True, True)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), atol=2e-4)


def test_fused_qkv_kernel_gradients_match_reference():
    B, h, N, dh, w = 1, 2, 128, 32, 16
    rng = np.random.default_rng(8)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * h * dh)), jnp.float32)
    g_ker = jax.grad(lambda q: (FK.fused_qkv_local_attention(
        q, h, dh, w, False, True, True) ** 2).sum())(qkv)
    g_ref = jax.grad(lambda q: (FK._jnp_reference(
        q, h, dh, w, False, True, True) ** 2).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref), atol=2e-3)


def test_fused_qkv_kernel_fallback_unaligned():
    # round 4: N=96 now runs as a single padded chunk instead of falling
    # back — must still match the bucketed reference exactly
    B, h, N, dh, w = 1, 2, 96, 32, 16
    rng = np.random.default_rng(9)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * h * dh)), jnp.float32)
    ref = FK._jnp_reference(qkv, h, dh, w, False, True, True)
    out = FK.fused_qkv_local_attention(qkv, h, dh, w, False, True, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fused_qkv_unaligned_live_config_shape():
    """An unaligned shape (H=152, w=16; the live dance_a config is H=96,
    also unaligned) pads to 160 and runs as one chunk; pad keys are valid zero keys exactly like the reference
    autopad (local_attention.py:124-126)."""
    B, h, N, dh, w = 2, 4, 152, 32, 16
    rng = np.random.default_rng(21)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * h * dh)), jnp.float32)
    assert FK.supports(N, w, use_xpos=False)
    ref = FK._jnp_reference(qkv, h, dh, w, False, True, True)
    ker = FK.fused_qkv_local_attention(qkv, h, dh, w, False, True, True)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), atol=2e-4)


@pytest.mark.parametrize("N,w", [(152, 16), (256, 16)])
def test_fused_qkv_key_mask_parity(N, w):
    """Key-mask operand (jagged stack-B batches): kernel == chunked
    emulation == the bucketed jnp path with the same mask."""
    from deepmimic_diffusion_mujoco_tpu.models.local_attention import (
        local_attention,
    )

    B, h, dh = 2, 2, 32
    rng = np.random.default_rng(22)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * h * dh)), jnp.float32)
    lengths = [N - 7, N // 2]
    km = jnp.asarray(
        np.arange(N)[None, :] < np.asarray(lengths)[:, None], jnp.float32)
    ker = FK.fused_qkv_local_attention(qkv, h, dh, w, False, True, True, km)
    emu = FK._jnp_chunked(qkv, km, None, h, dh, w, False, True, True, 1.0)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(emu), atol=2e-4)
    q, k, v = jnp.split(
        qkv.reshape(B, N, 3, h, dh).transpose(0, 3, 2, 1, 4), 3, axis=2)
    ref = local_attention(
        q[:, :, 0], k[:, :, 0], v[:, :, 0], w, exact_windowsize=True,
        use_rotary=True, key_mask=km,
    ).transpose(0, 2, 1, 3).reshape(B, N, h * dh)
    # only rows inside each sequence's real length are meaningful
    valid = np.asarray(km)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(ker) * valid, np.asarray(ref) * valid, atol=2e-4)


@pytest.mark.parametrize("N,w", [(152, 16), (256, 16)])
def test_fused_qkv_dropout_fixed_rng_parity(N, w):
    """Fixed-RNG dropout parity (VERDICT r3 item 2): the kernel with an
    injected keep mask equals the jnp transcription with the same mask."""
    B, h, dh, p_drop = 2, 2, 32, 0.3
    rng = np.random.default_rng(23)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * h * dh)), jnp.float32)
    keep = FK.dropout_keep_mask(
        jax.random.PRNGKey(5), 1.0 - p_drop, B, N, h, w)
    assert keep is not None
    ker = FK.fused_qkv_local_attention(
        qkv, h, dh, w, False, True, True, None, keep, 1.0 - p_drop)
    emu = FK._jnp_chunked(
        qkv, None, keep, h, dh, w, False, True, True, 1.0 - p_drop)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(emu), atol=2e-4)
    # an all-ones keep mask must reproduce the no-dropout output exactly
    ones = jnp.ones_like(keep)
    ker1 = FK.fused_qkv_local_attention(
        qkv, h, dh, w, False, True, True, None, ones, 1.0)
    ker0 = FK.fused_qkv_local_attention(qkv, h, dh, w, False, True, True)
    np.testing.assert_allclose(np.asarray(ker1), np.asarray(ker0), atol=2e-4)


def test_fused_qkv_dropout_and_mask_gradients():
    """custom-vjp backward replays the same keep/key masks."""
    B, h, N, dh, w, p_drop = 1, 2, 152, 32, 16, 0.3
    rng = np.random.default_rng(24)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * h * dh)), jnp.float32)
    km = jnp.asarray(np.arange(N)[None, :] < N - 9, jnp.float32)
    keep = FK.dropout_keep_mask(
        jax.random.PRNGKey(6), 1.0 - p_drop, B, N, h, w)
    g_ker = jax.grad(lambda q: (FK.fused_qkv_local_attention(
        q, h, dh, w, False, True, True, km, keep, 1.0 - p_drop) ** 2).sum()
    )(qkv)
    g_emu = jax.grad(lambda q: (FK._jnp_chunked(
        q, km, keep, h, dh, w, False, True, True, 1.0 - p_drop) ** 2).sum()
    )(qkv)
    np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_emu),
                               atol=2e-3)


def test_local_mha_pallas_live_training_config():
    """LocalTransformer at the live config shape (H=152, dropout 0.3):
    the Pallas path must stay ON, run, and match the jnp path when
    dropout is inactive (deterministic)."""
    from deepmimic_diffusion_mujoco_tpu.models.local_attention import (
        LocalTransformer,
    )

    kw = dict(input_dim=8, max_seq_len=152, dim=32, depth=1, heads=2,
              dim_head=16, window_size=16, attn_dropout=0.3, ff_dropout=0.3)
    m_ref = LocalTransformer(use_pallas=False, **kw)
    m_pal = LocalTransformer(use_pallas=True, **kw)
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(2, 152, 8)), jnp.float32)
    t = jnp.array([5, 9])
    mask = jnp.asarray(np.arange(152)[None, :] < np.array([[152], [100]]),
                       jnp.float32)
    params = m_ref.init(jax.random.PRNGKey(0), x, t)
    a = m_ref.apply(params, x, t, mask=mask, deterministic=True)
    b = m_pal.apply(params, x, t, mask=mask, deterministic=True)
    # fully-masked (padding) query rows are junk in both paths but junk of
    # different key-set sizes; only real rows are contractual
    valid = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(np.asarray(a) * valid, np.asarray(b) * valid,
                               atol=2e-4)
    # training mode: dropout active through the kernel path — runs, finite,
    # and actually drops (differs from the deterministic output)
    c = m_pal.apply(params, x, t, mask=mask, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(7)})
    assert np.isfinite(np.asarray(c)).all()
    assert not np.allclose(np.asarray(c), np.asarray(b), atol=1e-3)


def test_local_mha_use_pallas_flag():
    """LocalMHA with use_pallas routes through the dispatcher and matches."""
    from deepmimic_diffusion_mujoco_tpu.models.local_attention import LocalTransformer

    m_ref = LocalTransformer(input_dim=8, max_seq_len=128, dim=32, depth=1,
                             heads=2, dim_head=16, window_size=16,
                             use_pallas=False)
    m_pal = LocalTransformer(input_dim=8, max_seq_len=128, dim=32, depth=1,
                             heads=2, dim_head=16, window_size=16,
                             use_pallas=True)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 128, 8)), jnp.float32)
    t = jnp.array([5])
    params = m_ref.init(jax.random.PRNGKey(0), x, t)
    a = m_ref.apply(params, x, t)
    b = m_pal.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


class TestConvGnMish:
    def setup_method(self):
        from deepmimic_diffusion_mujoco_tpu.ops.pallas import conv_block_kernel as CK
        CK.INTERPRET = True
        self.CK = CK

    def teardown_method(self):
        self.CK.INTERPRET = False

    def test_forward_and_grad_parity(self):
        CK = self.CK
        rng = np.random.default_rng(0)
        B, H, Cin, Cout, k, g = 2, 64, 35, 64, 5, 8
        x = jnp.asarray(rng.normal(size=(B, H, Cin)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, Cin, Cout)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.normal(size=(Cout,)), jnp.float32)
        gamma = jnp.asarray(rng.normal(size=(Cout,)) * 0.5 + 1, jnp.float32)
        beta = jnp.asarray(rng.normal(size=(Cout,)) * 0.1, jnp.float32)
        ref = CK.conv_gn_mish_reference(x, w, b, gamma, beta, g)
        ker = CK.conv_gn_mish(x, w, b, gamma, beta, g)
        np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), atol=1e-4)
        g_k = jax.grad(lambda *a: (CK.conv_gn_mish(*a, g) ** 2).sum(),
                       argnums=(0, 1, 2))(x, w, b, gamma, beta)
        g_r = jax.grad(lambda *a: (CK.conv_gn_mish_reference(*a, g) ** 2).sum(),
                       argnums=(0, 1, 2))(x, w, b, gamma, beta)
        for a, c in zip(g_k, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-3)

    def test_unet_flag_flip_same_params(self):
        from deepmimic_diffusion_mujoco_tpu.models.temporal_unet import TemporalUnet

        m0 = TemporalUnet(transition_dim=8, dim=16)
        m1 = TemporalUnet(transition_dim=8, dim=16, use_pallas=True)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 32, 8)), jnp.float32)
        t = jnp.zeros((1,))
        params = m0.init(jax.random.PRNGKey(0), x, t)
        a = m0.apply(params, x, t)
        b = m1.apply(params, x, t)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_key_mask_prefix_contract_check():
    """DMDM_CHECK_MASKS=1 (here: the module flag) verifies the kernel's
    prefix-validity contract for key_mask at runtime: a prefix mask passes,
    a non-prefix mask raises instead of silently attending to wrong keys
    (ADVICE r4 medium)."""
    B, h, dh, N, w = 2, 2, 32, 128, 16
    rng = np.random.default_rng(5)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * h * dh)), jnp.float32)
    prefix = jnp.asarray(
        np.arange(N)[None, :] < np.asarray([N - 5, N // 2])[:, None],
        jnp.float32)
    hole = prefix.at[0, 10].set(0.0)  # non-prefix: a hole mid-sequence
    old = FK.CHECK_MASKS
    FK.CHECK_MASKS = True
    try:
        out = FK.fused_qkv_local_attention(
            qkv, h, dh, w, False, True, True, prefix)
        assert np.isfinite(np.asarray(out)).all()
        with pytest.raises(Exception, match="prefix-valid"):
            out = FK.fused_qkv_local_attention(
                qkv, h, dh, w, False, True, True, hole)
            jax.block_until_ready(out)
    finally:
        FK.CHECK_MASKS = False


def test_conv1d_weight_grad_kernel_matches_xla():
    """The weight-grad conv kernel (the round-5 MFU-headroom experiment)
    == the XLA conv-filter-gradient vjp, through the interpreter."""
    from deepmimic_diffusion_mujoco_tpu.ops.pallas import conv_weight_grad as CW

    B, H, Cin, Cout, k = 4, 12, 16, 24, 5
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(B, H, Cin)), jnp.float32)
    dy = jnp.asarray(rng.normal(size=(B, H, Cout)), jnp.float32)
    old = CW.INTERPRET
    CW.INTERPRET = True
    try:
        ker = CW.conv1d_weight_grad(x, dy, k, block_cin=16, block_cout=24)
    finally:
        CW.INTERPRET = old
    ref = CW.conv1d_weight_grad_xla(x, dy, k)
    assert ker.shape == (k, Cin, Cout)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_local_mha_auto_policy_routing(monkeypatch):
    """use_pallas="auto" (the default) must follow the measured policy:
    kernel OFF for plain deterministic inference below the crossover,
    ON for training-shaped calls (dropout) and above INFERENCE_MIN_N
    (VERDICT r4 weak #3 — claim text == measurement table)."""
    from deepmimic_diffusion_mujoco_tpu.models.local_attention import (
        LocalTransformer,
    )

    calls = []
    orig = FK.fused_qkv_local_attention

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(FK, "fused_qkv_local_attention", spy)

    def run(N, dropout, deterministic, use_pallas="auto"):
        kw = dict(input_dim=8, max_seq_len=1024, dim=32, depth=1, heads=2,
                  dim_head=16, window_size=16, attn_dropout=dropout,
                  use_pallas=use_pallas)
        m = LocalTransformer(**kw)
        x = jnp.zeros((1, N, 8), jnp.float32)
        t = jnp.array([3])
        params = m.init(jax.random.PRNGKey(0), x, t)
        calls.clear()
        extra = {} if deterministic else {"rngs": {"dropout": jax.random.PRNGKey(1)}}
        m.apply(params, x, t, deterministic=deterministic, **extra)
        return len(calls)

    assert run(128, 0.0, True) == 0          # plain inference below crossover
    assert run(512, 0.0, True) == 0          # still below (0.97x measured)
    assert run(1024, 0.0, True) > 0          # at/above the crossover
    assert run(128, 0.3, False) > 0          # training-shaped (dropout)
    assert run(128, 0.0, True, use_pallas=True) > 0   # explicit override
    assert run(1024, 0.0, True, use_pallas=False) == 0 # explicit off
