"""Windowed (block-local) attention transformer denoiser.

Re-design of the reference `LocalTransformer` / `LocalMHA` / `LocalAttention`
(diffuser/models/transformer_local_attention.py:266-429,68-140;
local_attention.py:35-242 — lucidrains' local-attention adapted for motion).

TPU-first formulation: instead of gather-based `look_around` (unfold +
movedim, local_attention.py:44-48), keys/values are bucketed into
(num_windows, window) blocks and neighbor blocks are brought in by static
slicing of a padded window axis — a layout that XLA turns into cheap
concatenation, keeps every matmul a dense (w x jw) MXU tile, and maps 1:1
onto sequence-sharded halo exchange (`ppermute` of neighbor blocks) when the
time axis is sharded across devices (SURVEY.md section 5 "long-context").

Semantics parity with the reference:

- look_backward/look_forward window neighborhoods, pad windows masked,
- `exact_windowsize` masking (LocalMHA defaults it True,
  transformer_local_attention.py:104),
- causal masking option,
- rotary embeddings over intra-neighborhood positions with optional xpos
  scaling, enabling window-size extrapolation at inference
  (local_attention.py:115-117, rotary.py:34-66),
- autopad to window multiples (local_attention.py:124-126).

Known reference divergences (deliberate): the `hyper_connections` pip
package the reference imports is absent from its own environment.yml
(SURVEY.md section 2.11) — residual streams here are standard pre-norm
residuals; the broken `.optimized_local_attention` import is replaced by a
working Pallas kernel flag (ops/pallas, used when `use_pallas=True`).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .embeddings import mdm_timestep_embedding, rotary_angles, apply_rotary, xpos_scale

NEG_INF = -1e9


def _look_around(bx: jnp.ndarray, backward: int, forward: int, pad_value=0.0):
    """(..., nw, w, d) -> (..., nw, (backward+forward+1)*w, d).

    Window i's neighborhood = windows [i-backward, i+forward], out-of-range
    windows filled with pad_value (local_attention.py:44-48).
    """
    nw = bx.shape[-3]
    pads = [(0, 0)] * bx.ndim
    pads[-3] = (backward, forward)
    padded = jnp.pad(bx, pads, constant_values=pad_value)
    pieces = [
        jax.lax.slice_in_dim(padded, i, i + nw, axis=bx.ndim - 3)
        for i in range(backward + forward + 1)
    ]
    return jnp.concatenate(pieces, axis=-2)


def local_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    window_size: int,
    *,
    causal: bool = False,
    look_backward: int = 1,
    look_forward: int | None = None,
    exact_windowsize: bool = True,
    use_rotary: bool = True,
    use_xpos: bool = False,
    xpos_scale_base: float | None = None,
    key_mask: jnp.ndarray | None = None,
    scale: float | None = None,
    mask_window_size: int | None = None,
) -> jnp.ndarray:
    """Windowed attention over (B, heads, N, dh) tensors.

    `window_size` may differ from the trained one when xpos is on — the
    reference's window-size extrapolation (local_attention.py:115-117).
    `mask_window_size` is the TRAINED window size: the reference's
    exact-windowsize masks are computed from `self.window_size` even when
    bucketing uses an overridden runtime window
    (local_attention.py:190-201) — pass it when extrapolating.
    """
    if look_forward is None:
        look_forward = 0 if causal else 1
    B, h, N, dh = q.shape
    w = window_size
    pad = (-N) % w
    if pad:  # autopad (local_attention.py:124-126)
        padcfg = ((0, 0), (0, 0), (0, pad), (0, 0))
        q, k, v = (jnp.pad(t, padcfg) for t in (q, k, v))
        if key_mask is not None:
            key_mask = jnp.pad(key_mask, ((0, 0), (0, pad)))
    n = N + pad
    nw = n // w
    scale = dh ** -0.5 if scale is None else scale

    bq = q.reshape(B, h, nw, w, dh) * scale
    bk = k.reshape(B, h, nw, w, dh)
    bv = v.reshape(B, h, nw, w, dh)
    bk = _look_around(bk, look_backward, look_forward)
    bv = _look_around(bv, look_backward, look_forward)
    jw = (look_backward + look_forward + 1) * w

    if use_rotary:
        # intra-neighborhood positions [0, jw); queries sit at the LAST w
        # positions (rotary.py:56-66: q_freqs = freqs[..., -q_len:, :])
        ang = rotary_angles(jw, dh).astype(q.dtype)
        if use_xpos:
            sb = xpos_scale_base if xpos_scale_base is not None else w // 2
            sc = xpos_scale(jw, dh, sb).astype(q.dtype)
            sc2 = jnp.concatenate([sc, sc], axis=-1)
            bq = apply_rotary(bq, ang[-w:]) * sc2[-w:]
            bk = apply_rotary(bk, ang) * (sc2 ** -1)
        else:
            bq = apply_rotary(bq, ang[-w:])
            bk = apply_rotary(bk, ang)

    # positions for masking (sentinel -1 marks out-of-range windows);
    # pure numpy so the mask is a compile-time constant under jit
    t_pos = np.arange(n).reshape(nw, w)
    padded = np.concatenate(
        [np.full((look_backward, w), -1, np.int64), t_pos,
         np.full((look_forward, w), -1, np.int64)], axis=0
    )
    j_pos = np.concatenate(
        [padded[i : i + nw] for i in range(look_backward + look_forward + 1)],
        axis=-1,
    )  # (nw, jw)
    ti = t_pos[:, :, None]          # (nw, w, 1)
    tj = j_pos[:, None, :]          # (nw, 1, jw)
    neg = tj < 0
    mw = mask_window_size if mask_window_size is not None else w
    if causal:
        bad = ti < tj
        if exact_windowsize:
            bad |= ti > tj + mw * look_backward
    elif exact_windowsize:
        bad = (tj - mw * look_forward > ti) | (ti > tj + mw * look_backward)
    else:
        bad = np.zeros_like(neg)
    mask = jnp.asarray(bad | neg)[None, None]  # (1,1,nw,w,jw)

    sim = jnp.einsum("bhnie,bhnje->bhnij", bq, bk)
    sim = jnp.where(mask, NEG_INF, sim)
    if key_mask is not None:
        km = _look_around(
            key_mask.reshape(B, nw, w, 1), look_backward, look_forward,
            pad_value=0.0,
        )[..., 0]  # (B, nw, jw)
        sim = jnp.where(km[:, None, :, None, :] > 0, sim, NEG_INF)
    attn = nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhnij,bhnje->bhnie", attn, bv)
    out = out.reshape(B, h, n, dh)
    return out[:, :, :N]


class LocalMHA(nn.Module):
    """Pre-norm local multi-head attention
    (transformer_local_attention.py:68-140)."""

    window_size: int
    heads: int = 8
    dim_head: int = 64
    causal: bool = False
    exact_windowsize: bool = True
    use_xpos: bool = False
    xpos_scale_base: float | None = None
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_mask=None, window_size=None):
        B, N, D = x.shape
        h, dh = self.heads, self.dim_head
        normed = nn.LayerNorm(dtype=self.dtype)(x)
        qkv = nn.Dense(3 * h * dh, use_bias=False, dtype=self.dtype)(normed)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, h, dh).transpose(0, 3, 2, 1, 4), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]  # (B, h, N, dh)
        w = window_size if window_size is not None else self.window_size
        # the Pallas kernel takes no key mask and no trained-window override
        # (mask_window_size), so jagged batches and window-size extrapolation
        # must go through the jnp path for correct masking
        use_pallas = (
            self.use_pallas and key_mask is None and window_size is None
        )
        if use_pallas:
            from ..ops.pallas import local_attention_pallas

            out = local_attention_pallas(
                q, k, v, w, causal=self.causal,
                exact_windowsize=self.exact_windowsize,
                use_xpos=self.use_xpos, xpos_scale_base=self.xpos_scale_base,
            )
        else:
            out = local_attention(
                q, k, v, w, causal=self.causal,
                exact_windowsize=self.exact_windowsize,
                use_xpos=self.use_xpos,
                # xpos scale base is anchored to the TRAINED window
                # (local_attention.py:100-101)
                xpos_scale_base=(
                    self.xpos_scale_base
                    if self.xpos_scale_base is not None
                    else self.window_size // 2
                ),
                key_mask=key_mask, mask_window_size=self.window_size,
            )
        out = out.transpose(0, 2, 1, 3).reshape(B, N, h * dh)
        return nn.Dense(D, use_bias=False, dtype=self.dtype)(out)


class GEGLUFeedForward(nn.Module):
    """Pre-norm GEGLU MLP (transformer_local_attention.py:215-224):
    inner = dim * mult * 2/3, gate via GELU."""

    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        D = x.shape[-1]
        inner = int(D * self.mult * 2 / 3)
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype)(h)
        a, g = jnp.split(h, 2, axis=-1)
        h = a * nn.gelu(g)
        return nn.Dense(D, use_bias=False, dtype=self.dtype)(h)


class LocalTransformer(nn.Module):
    """Stack-B local-attention denoiser
    (transformer_local_attention.py:266-429). Default hyperparameters match
    the reference CLI config (train_transformer.py:469-482)."""

    input_dim: int
    max_seq_len: int = 128
    dim: int = 512
    depth: int = 6
    heads: int = 8
    dim_head: int = 64
    window_size: int = 16
    causal: bool = False
    ff_mult: int = 4
    use_xpos: bool = False
    num_classes: int = 0
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time=None, y=None, mask=None, window_size=None):
        B, N, _ = x.shape
        h = nn.Dense(self.dim, dtype=self.dtype, name="pose_embed")(x)
        if time is not None:
            t = mdm_timestep_embedding(time, self.dim)
            t = nn.Dense(self.dim, dtype=self.dtype, name="time_embed_0")(t)
            t = nn.silu(t)
            t = nn.Dense(self.dim, dtype=self.dtype, name="time_embed_1")(t)
            h = h + t[:, None, :]
        pos = self.param(
            "pos_emb", nn.initializers.normal(1.0), (self.max_seq_len, self.dim)
        )
        h = h + pos[None, :N, :].astype(self.dtype)
        if self.num_classes > 0:
            cls = nn.Embed(self.num_classes + 1, self.dim, dtype=self.dtype,
                           name="class_embed")
            if y is None:
                y = jnp.full((B,), self.num_classes, jnp.int32)
            h = h + cls(jnp.clip(y, 0, self.num_classes))[:, None, :]

        for i in range(self.depth):
            h = h + LocalMHA(
                window_size=self.window_size, heads=self.heads,
                dim_head=self.dim_head, causal=self.causal,
                use_xpos=self.use_xpos, use_pallas=self.use_pallas,
                dtype=self.dtype, name=f"attn_{i}",
            )(h, key_mask=mask, window_size=window_size)
            h = h + GEGLUFeedForward(self.ff_mult, dtype=self.dtype,
                                     name=f"ff_{i}")(h)

        h = nn.LayerNorm(dtype=self.dtype)(h)
        out = nn.Dense(self.input_dim, dtype=self.dtype, name="final_layer")(h)
        return out.astype(jnp.float32)
