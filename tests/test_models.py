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


def test_local_transformer_kv_cache_incremental_decode():
    """Incremental KV-cache decode (reference
    transformer_local_attention.py:135-206,363-426) equals the
    full-sequence causal forward frame by frame."""
    m = la.LocalTransformer(
        input_dim=10, max_seq_len=32, dim=32, depth=2, heads=2, dim_head=8,
        window_size=4, causal=True, num_residual_streams=4, use_pallas=False,
    )
    rng = np.random.default_rng(11)
    N = 24
    x = jnp.asarray(rng.normal(size=(2, N, 10)), jnp.float32)
    t = jnp.array([3, 7])
    params = m.init(jax.random.PRNGKey(0), x, t)
    full = m.apply(params, x, t)
    cache = m.init_decode_cache(2)
    step = jax.jit(lambda xt, i, c: m.apply(
        params, xt, t, cache=c, decode_pos=i))
    outs = []
    for i in range(N):
        o, cache = step(x[:, i:i + 1], jnp.asarray(i), cache)
        outs.append(o)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full), atol=2e-4)


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


def test_hyper_connections_init_equals_plain_residual():
    """At init the dynamic HC terms are zero and static terms are identity,
    so the 4-stream model == the plain-residual model (sum of S identical
    streams is absorbed by the scale-invariant final LayerNorm)."""
    kw = dict(input_dim=12, max_seq_len=32, dim=32, depth=2, heads=2,
              dim_head=8, window_size=8)
    m4 = la.LocalTransformer(**kw, num_residual_streams=4)
    m1 = la.LocalTransformer(**kw, num_residual_streams=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 24, 12)), jnp.float32)
    t = jnp.array([3, 7])
    p4 = m4.init(jax.random.PRNGKey(0), x, t)
    p1 = {"params": {k: v for k, v in p4["params"].items()
                     if not k.startswith("hc_")}}
    out4 = m4.apply(p4, x, t)
    out1 = m1.apply(p1, x, t)
    np.testing.assert_allclose(np.asarray(out4), np.asarray(out1), atol=2e-5)
    # and the HC params exist with the documented shapes
    hc = p4["params"]["hc_attn_0"]
    assert hc["static_alpha"].shape == (4, 5)
    assert hc["static_beta"].shape == (4,)
    assert hc["dynamic_alpha_fn"].shape == (32, 5)


def test_hyper_connections_gradients_flow():
    """Every HC parameter gets a nonzero (or at least defined) gradient."""
    m = la.LocalTransformer(input_dim=6, max_seq_len=16, dim=16, depth=1,
                            heads=2, dim_head=8, window_size=4,
                            num_residual_streams=4)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 6)), jnp.float32)
    t = jnp.array([3, 7])
    params = m.init(jax.random.PRNGKey(0), x, t)

    def loss(p):
        return (m.apply(p, x, t) ** 2).mean()

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g["params"]["hc_attn_0"])
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # static alpha mixes the streams the branch reads -> must receive grads
    assert np.abs(np.asarray(g["params"]["hc_attn_0"]["static_alpha"])).max() > 0


def test_local_transformer_dropout_active_and_deterministic():
    m = la.LocalTransformer(input_dim=8, max_seq_len=32, dim=32, depth=2,
                            heads=2, dim_head=8, window_size=8,
                            num_residual_streams=1,
                            attn_dropout=0.3, ff_dropout=0.3)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 24, 8)), jnp.float32)
    t = jnp.array([1, 2])
    params = m.init(jax.random.PRNGKey(0), x, t)
    det = m.apply(params, x, t)
    a = m.apply(params, x, t, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(1)})
    b = m.apply(params, x, t, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(2)})
    det2 = m.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(det), np.asarray(det2))
    assert np.abs(np.asarray(a) - np.asarray(det)).max() > 1e-4
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4


def test_dynamic_position_bias_option():
    """DPB replaces rotary; table shape (2w, heads); bias params train."""
    m = la.LocalTransformer(input_dim=8, max_seq_len=32, dim=32, depth=1,
                            heads=2, dim_head=8, window_size=8,
                            num_residual_streams=1,
                            use_dynamic_pos_bias=True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 24, 8)), jnp.float32)
    t = jnp.array([5])
    params = m.init(jax.random.PRNGKey(0), x, t)
    assert "dynamic_pos_bias" in params["params"]
    out = m.apply(params, x, t)
    assert out.shape == (1, 24, 8)

    # zeroing the last DPB layer's effect changes the output (bias is live)
    import flax

    flat = flax.traverse_util.flatten_dict(params["params"])
    for k in list(flat):
        if k[0] == "dynamic_pos_bias" and k[-1] in ("kernel", "bias"):
            flat[k] = jnp.zeros_like(flat[k]) + (0.5 if k[-1] == "bias" else 0.1)
    p2 = {"params": flax.traverse_util.unflatten_dict(flat)}
    out2 = m.apply(p2, x, t)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-5


def test_local_transformer_global_attn_inserts():
    """Global-attention inserts (transformer_local_attention.py:285-327):
    full-attention branches before the local attention in selected layers;
    enabling them only ADDS parameters (existing names stable)."""
    import flax

    kw = dict(input_dim=8, max_seq_len=64, dim=32, depth=2, heads=2,
              dim_head=16, window_size=8)
    m0 = la.LocalTransformer(**kw)
    mg = la.LocalTransformer(**kw, use_global_attn=True,
                             global_attn_layers=(2,))
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 32, 8)), jnp.float32)
    t = jnp.array([3, 7])
    p0 = m0.init(jax.random.PRNGKey(0), x, t)
    pg = mg.init(jax.random.PRNGKey(0), x, t)
    f0 = set(flax.traverse_util.flatten_dict(p0["params"]))
    fg = set(flax.traverse_util.flatten_dict(pg["params"]))
    assert f0 < fg, "global inserts must be purely additive"
    added = {k[0] for k in fg - f0}
    assert added == {"global_attn_1", "hc_global_1"}

    out = mg.apply(pg, x, t)
    assert out.shape == (2, 32, 8)
    assert np.isfinite(np.asarray(out)).all()

    # the insert is live: with the local branches zeroed out a token still
    # reaches the far end of the sequence through the global branch alone
    flatg = flax.traverse_util.flatten_dict(pg["params"])
    for k in list(flatg):
        if k[0].startswith(("attn_", "ff_")) and k[-1] == "kernel":
            flatg[k] = jnp.zeros_like(flatg[k])
    pz = {"params": flax.traverse_util.unflatten_dict(flatg)}
    base = mg.apply(pz, x, t)
    x2 = x.at[:, 0].add(3.0)
    d = np.abs(np.asarray(mg.apply(pz, x2, t) - base))
    assert d[:, -1].max() > 1e-7, "global branch must carry long-range info"

    # masked call works through the global branch too
    mask = jnp.ones((2, 32), jnp.float32).at[:, -4:].set(0.0)
    outm = mg.apply(pg, x, t, mask=mask)
    assert np.isfinite(np.asarray(outm)).all()

    # empty tuple = all layers
    mall = la.LocalTransformer(**kw, use_global_attn=True)
    pall = mall.init(jax.random.PRNGKey(0), x, t)
    names = set(flax.traverse_util.flatten_dict(pall["params"]))
    assert {k[0] for k in names if k[0].startswith("global_attn")} == {
        "global_attn_0", "global_attn_1"}


def test_transformer_adaln_conditioning():
    """adaLN-zero variant (VERDICT r4 item 3): identical API, zero-init
    modulation means class/time condition the stream through per-layer
    FiLM; null label == y=None; labels change the output; at init the
    modulation projections are exactly zero."""
    m = TransformerMotionModel(
        input_dim=69, latent_dim=64, n_heads=4, num_layers=2,
        dim_feedforward=128, max_sequence_length=64, num_classes=9,
        conditioning="adaln",
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 40, 69)),
                    jnp.float32)
    t = jnp.array([3, 7])
    params = m.init(jax.random.PRNGKey(0), x, t)
    # adaLN-zero: every modulation projection starts at exactly zero
    mods = [v for k, v in jax.tree_util.tree_flatten_with_path(params)[0]
            if "adaln_mod" in jax.tree_util.keystr(k)
            or "final_mod" in jax.tree_util.keystr(k)]
    assert mods and all(float(np.abs(np.asarray(v)).max()) == 0.0
                        for v in mods)
    out_cond = m.apply(params, x, t, y=jnp.array([1, 2]))
    out_null = m.apply(params, x, t, y=jnp.array([9, 9]))
    out_none = m.apply(params, x, t)
    assert out_cond.shape == (2, 40, 69)
    np.testing.assert_allclose(np.asarray(out_null), np.asarray(out_none))

    # after perturbing the modulation weights, the label must reach the
    # output through the FiLM path (at zero-init cond/uncond coincide)
    import jax as _jax

    def bump(path, v):
        if "adaln_mod" in _jax.tree_util.keystr(path) and v.ndim == 2:
            return v + 0.01
        return v

    params2 = _jax.tree_util.tree_map_with_path(bump, params)
    a = m.apply(params2, x, t, y=jnp.array([1, 2]))
    b = m.apply(params2, x, t, y=jnp.array([9, 9]))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 0

    # padding-mask semantics hold in the adaLN path too
    mask = jnp.asarray(np.r_[np.ones(30), np.zeros(10)][None].repeat(2, 0),
                       jnp.float32)
    base = m.apply(params2, x, t, y=jnp.array([1, 2]), mask=mask)
    x2 = x.at[0, 35].set(99.0)
    pert = m.apply(params2, x2, t, y=jnp.array([1, 2]), mask=mask)
    np.testing.assert_allclose(np.asarray(base[0, :30]),
                               np.asarray(pert[0, :30]), atol=1e-5)
