"""Pallas TPU kernel: fused block-local (windowed) attention.

Design: queries are processed in 128-row CHUNKS (the MXU tile height) and
each program sees exactly three key/value blocks — the chunk's own block
plus its left/right neighbors, delivered by BlockSpec index maps (clamped
at the sequence edges; the duplicate edge blocks are masked out by
position). The window structure (look-around neighborhoods, exact-window
bounds, causality) is enforced entirely by a position mask, so the whole
chunk reduces to one (C x dh) @ (dh x 3C) and one (C x 3C) @ (3C x dh)
MXU product. The (B, h, nw, jw, dh) looked-around key tensor the XLA path
materializes (models/local_attention.py _look_around) is never built —
that 3x HBM blowup is the traffic this fusion removes.

Rotary: the reference applies rotary at neighborhood-relative positions
recomputed per window (local_attention.py:154-160 + rotary.py:56-66, with
queries anchored at the last w neighborhood slots). Rotary attention
depends only on position DIFFERENCES, and (q at i - start + lf*w, k at
j - start) differences equal (q at i + lf*w, k at j), so the kernel uses
absolute positions shifted by lf*w — mathematically identical.

Constraints: requires chunk-aligned sequences (N % 128 == 0) and
window_size <= 128; otherwise (and for xpos extrapolation, which needs
asymmetric q/k scaling) it falls back to the jnp path. The backward pass
recomputes through the jnp reference via custom_vjp, so gradients are
exact while sampling and the training forward take the fused path.

MEASURED (TPU v5e, bf16): the ISOLATED kernel beats the XLA formulation at
long horizon (N=4096: 19us vs 30us, 1.6x) and loses below it (N=1024: 24us
vs 18us). END-TO-END inside LocalTransformer the XLA path currently wins at
all tested shapes (e.g. H=1024 dim512 depth6: 6.7 vs 10.1 ms/denoise-step)
because the custom call is a fusion barrier between the surrounding
matmuls. `use_pallas` therefore defaults to False; the kernel is the
measured alternative the build plan calls for (SURVEY.md section 7 step 6)
and the basis for future fused-block work.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
CHUNK = 128

# set True to run the kernel through the Pallas interpreter (CPU-testable)
INTERPRET = False


def _attn_kernel(
    q_ref, kp_ref, kc_ref, kn_ref, vp_ref, vc_ref, vn_ref, freq_ref, out_ref,
    *, w: int, lb: int, lf: int, C: int, nc: int,
    causal: bool, exact: bool, use_rotary: bool,
):
    c = pl.program_id(1)
    dh = q_ref.shape[-1]
    scale = dh ** -0.5

    q = q_ref[0, :, :] * scale                                  # (C, dh)
    k = jnp.concatenate([kp_ref[0], kc_ref[0], kn_ref[0]], axis=0)  # (3C, dh)
    v = jnp.concatenate([vp_ref[0], vc_ref[0], vn_ref[0]], axis=0)

    # 2-D position arithmetic throughout (Mosaic has no 1-D concat/iota)
    i_pos = c * C + jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)   # (C, 1)
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * C), 1)       # (1, 3C)
    seg = j_iota // C                                                 # 0|1|2
    off = j_iota % C
    # absolute start of each key block (prev clamps to block 0 at the left
    # edge, next to block nc-1 at the right — duplicates masked below)
    prev_start = jnp.maximum(c - 1, 0) * C
    next_start = jnp.minimum(c + 1, nc - 1) * C
    block_start = jnp.where(seg == 0, prev_start,
                            jnp.where(seg == 1, c * C, next_start))
    j_pos = block_start + off                                         # (1, 3C)
    seg_invalid = ((seg == 0) & (c == 0)) | ((seg == 2) & (c == nc - 1))

    if use_rotary:
        def rot(x, pos_col):
            ang = pos_col.astype(jnp.float32) * freq_ref[0, :][None, :]
            x1 = x[:, : dh // 2]
            x2 = x[:, dh // 2 :]
            rx = jnp.concatenate([-x2, x1], axis=-1)
            return x * jnp.cos(ang) + rx * jnp.sin(ang)

        q = rot(q, i_pos + lf * w)
        k = rot(k, j_pos.reshape(3 * C, 1))

    sim = jnp.dot(q, k.T, preferred_element_type=jnp.float32)   # (C, 3C)

    ti = i_pos                                                  # (C, 1)
    tj = j_pos                                                  # (1, 3C)
    wi = ti // w
    wj = tj // w
    bad = (wj < wi - lb) | (wj > wi + lf) | seg_invalid
    if causal:
        bad |= ti < tj
        if exact:
            bad |= ti > tj + w * lb
    elif exact:
        bad |= (tj - w * lf > ti) | (ti > tj + w * lb)
    sim = jnp.where(bad, NEG_INF, sim)

    p = jax.nn.softmax(sim, axis=-1)
    out_ref[0, :, :] = jnp.dot(
        p, v, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def local_attention_tpu(
    q, k, v, window_size, causal=False, exact_windowsize=True,
    use_rotary=True, use_xpos=False, xpos_scale_base=None,
):
    return _forward(q, k, v, window_size, causal, exact_windowsize,
                    use_rotary, use_xpos, xpos_scale_base)


def _jnp_fallback(q, k, v, window_size, causal, exact_windowsize,
                  use_rotary, use_xpos, xpos_scale_base):
    from ...models.local_attention import local_attention

    return local_attention(
        q, k, v, window_size, causal=causal,
        exact_windowsize=exact_windowsize, use_rotary=use_rotary,
        use_xpos=use_xpos, xpos_scale_base=xpos_scale_base,
    )


def _forward(q, k, v, window_size, causal, exact_windowsize, use_rotary,
             use_xpos, xpos_scale_base):
    B, h, N, dh = q.shape
    w = window_size
    lb, lf = 1, (0 if causal else 1)
    C = CHUNK
    if use_xpos or N % w or N % C or max(lb, lf) * w > C:
        return _jnp_fallback(q, k, v, window_size, causal, exact_windowsize,
                             use_rotary, use_xpos, xpos_scale_base)
    nc = N // C

    qf = q.reshape(B * h, N, dh)
    kf = k.reshape(B * h, N, dh)
    vf = v.reshape(B * h, N, dh)
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dh, 2, dtype=np.float32) / dh))
    freqs = jnp.asarray(np.concatenate([inv_freq, inv_freq])[None, :])

    kernel = functools.partial(
        _attn_kernel, w=w, lb=lb, lf=lf, C=C, nc=nc,
        causal=causal, exact=exact_windowsize, use_rotary=use_rotary,
    )
    blk = (1, C, dh)
    cur = pl.BlockSpec(blk, lambda i, c: (i, c, 0), memory_space=pltpu.VMEM)
    prev = pl.BlockSpec(
        blk, lambda i, c: (i, jnp.maximum(c - 1, 0), 0), memory_space=pltpu.VMEM
    )
    nxt = pl.BlockSpec(
        blk, lambda i, c: (i, jnp.minimum(c + 1, nc - 1), 0),
        memory_space=pltpu.VMEM,
    )
    fspec = pl.BlockSpec((1, dh), lambda i, c: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * h, N, dh), q.dtype),
        grid=(B * h, nc),
        in_specs=[cur, prev, cur, nxt, prev, cur, nxt, fspec],
        out_specs=cur,
        interpret=INTERPRET,
    )(qf, kf, kf, kf, vf, vf, vf, freqs)
    return out.reshape(B, h, N, dh)


def _fwd(q, k, v, window_size, causal, exact_windowsize, use_rotary,
         use_xpos, xpos_scale_base):
    out = _forward(q, k, v, window_size, causal, exact_windowsize,
                   use_rotary, use_xpos, xpos_scale_base)
    return out, (q, k, v)


def _bwd(window_size, causal, exact_windowsize, use_rotary, use_xpos,
         xpos_scale_base, res, g):
    """Exact gradients by differentiating the jnp reference."""
    q, k, v = res

    def ref(q, k, v):
        return _jnp_fallback(q, k, v, window_size, causal, exact_windowsize,
                             use_rotary, use_xpos, xpos_scale_base)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


local_attention_tpu.defvjp(_fwd, _bwd)
