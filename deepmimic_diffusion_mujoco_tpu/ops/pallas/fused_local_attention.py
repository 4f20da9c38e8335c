"""Pallas TPU kernel, round 2: windowed attention fused over ALL heads,
operating directly on the QKV projection's natural output layout.

Round-1 lesson (local_attention_kernel.py docstring): the isolated windowed
kernel beat XLA at long horizon but LOST end-to-end because its boundary
tensors live in a per-head `(B*h, N, dh)` layout — XLA had to materialize
layout transposes on both sides of the custom call, and the custom call is
a fusion barrier for them. This kernel removes that boundary cost by
construction:

- input  = the QKV Dense output `(B, N, 3*h*dh)` exactly as the matmul
  produces it (a tensor XLA materializes regardless);
- output = the pre-out-projection context `(B, N, h*dh)` exactly as the
  out-projection matmul consumes it;
- all heads are processed inside one program (static per-head slices of
  the lane dimension), so no transpose, reshape, or per-head dispatch
  exists outside the kernel.

What the fusion removes vs the XLA path (models/local_attention.py):
the `(B, h, nw, jw, dh)` looked-around key/value tensors (a 3x HBM blowup
at look_backward=look_forward=1), the bucketed q/k/v reshapes, and the
per-window similarity/attention intermediates. Each program reads its own
128-row chunk plus its two neighbor chunks (BlockSpec-clamped at the
edges) and computes the full look-around window structure with one
position mask, as in round 1.

Rotary uses the absolute-position equivalence proved in
local_attention_kernel.py (differences are what matter; q shifted by
look_forward*w matches the reference's neighborhood anchoring).

Semantics guards (fall back to the jnp path): xpos scaling (asymmetric
q/k scales break the difference trick), key masks, window overrides,
position-bias tables, attention dropout, N % 128 != 0, window > 128.

Reference behavior: local_attention.py:104-242 (look_around windows,
exact-window masks); integration transformer_local_attention.py:68-140.
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

# flip to run through the Pallas interpreter (CPU-testable)
INTERPRET = False


def _kernel(
    qkv_c_ref, qkv_p_ref, qkv_n_ref, freq_ref, out_ref,
    *, w: int, lb: int, lf: int, C: int, nc: int, h: int, dh: int,
    causal: bool, exact: bool, use_rotary: bool,
):
    c = pl.program_id(1)
    scale = dh ** -0.5
    hd = h * dh

    # 2-D position arithmetic (Mosaic has no 1-D iota)
    i_pos = c * C + jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)   # (C,1)
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * C), 1)      # (1,3C)
    seg = j_iota // C
    off = j_iota % C
    prev_start = jnp.maximum(c - 1, 0) * C
    next_start = jnp.minimum(c + 1, nc - 1) * C
    block_start = jnp.where(seg == 0, prev_start,
                            jnp.where(seg == 1, c * C, next_start))
    j_pos = block_start + off                                        # (1,3C)
    seg_invalid = ((seg == 0) & (c == 0)) | ((seg == 2) & (c == nc - 1))

    ti, tj = i_pos, j_pos
    wi, wj = ti // w, tj // w
    bad = (wj < wi - lb) | (wj > wi + lf) | seg_invalid
    if causal:
        bad |= ti < tj
        if exact:
            bad |= ti > tj + w * lb
    elif exact:
        bad |= (tj - w * lf > ti) | (ti > tj + w * lb)

    if use_rotary:
        # cos/sin tables shared by every head (all heads use the same
        # inv-freq over dh); computed once per program
        q_ang = (i_pos + lf * w).astype(jnp.float32) * freq_ref[0][None, :]
        k_ang = j_pos.reshape(3 * C, 1).astype(jnp.float32) * freq_ref[0][None, :]
        q_cos, q_sin = jnp.cos(q_ang), jnp.sin(q_ang)      # (C, dh)
        k_cos, k_sin = jnp.cos(k_ang), jnp.sin(k_ang)      # (3C, dh)

    def rot(x, cos, sin):
        x1 = x[:, : dh // 2]
        x2 = x[:, dh // 2:]
        rx = jnp.concatenate([-x2, x1], axis=-1)
        return x * cos + rx * sin

    for head in range(h):
        o = head * dh
        q = qkv_c_ref[0, :, o:o + dh].astype(jnp.float32) * scale   # (C,dh)
        k = jnp.concatenate([
            qkv_p_ref[0, :, hd + o:hd + o + dh],
            qkv_c_ref[0, :, hd + o:hd + o + dh],
            qkv_n_ref[0, :, hd + o:hd + o + dh],
        ], axis=0).astype(jnp.float32)                              # (3C,dh)
        v = jnp.concatenate([
            qkv_p_ref[0, :, 2 * hd + o:2 * hd + o + dh],
            qkv_c_ref[0, :, 2 * hd + o:2 * hd + o + dh],
            qkv_n_ref[0, :, 2 * hd + o:2 * hd + o + dh],
        ], axis=0).astype(jnp.float32)
        if use_rotary:
            q = rot(q, q_cos, q_sin)
            k = rot(k, k_cos, k_sin)
        sim = jnp.dot(q, k.T, preferred_element_type=jnp.float32)   # (C,3C)
        sim = jnp.where(bad, NEG_INF, sim)
        p = jax.nn.softmax(sim, axis=-1)
        out_ref[0, :, o:o + dh] = jnp.dot(
            p, v, preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def fused_qkv_local_attention(
    qkv, heads, dim_head, window_size, causal=False, exact_windowsize=True,
    use_rotary=True,
):
    """(B, N, 3*h*dh) qkv -> (B, N, h*dh) attention context, all heads.

    Drop-in for the reshape -> local_attention -> reshape sequence in
    LocalMHA when rotary (non-xpos) positions are in use.
    """
    return _forward(qkv, heads, dim_head, window_size, causal,
                    exact_windowsize, use_rotary)


def supports(N: int, window_size: int, use_xpos: bool) -> bool:
    lb, lf = 1, 1
    return (not use_xpos and N % CHUNK == 0
            and max(lb, lf) * window_size <= CHUNK and N % window_size == 0)


def _jnp_reference(qkv, heads, dim_head, window_size, causal,
                   exact_windowsize, use_rotary):
    from ...models.local_attention import local_attention

    B, N, _ = qkv.shape
    h, dh = heads, dim_head
    q, k, v = jnp.split(
        qkv.reshape(B, N, 3, h, dh).transpose(0, 3, 2, 1, 4), 3, axis=2)
    out = local_attention(
        q[:, :, 0], k[:, :, 0], v[:, :, 0], window_size, causal=causal,
        exact_windowsize=exact_windowsize, use_rotary=use_rotary,
        use_xpos=False, xpos_scale_base=None,
    )
    return out.transpose(0, 2, 1, 3).reshape(B, N, h * dh)


def _forward(qkv, heads, dim_head, window_size, causal, exact_windowsize,
             use_rotary):
    B, N, three_hd = qkv.shape
    h, dh, w = heads, dim_head, window_size
    assert three_hd == 3 * h * dh
    lb, lf = 1, (0 if causal else 1)
    on_tpu = jax.default_backend() == "tpu"
    if not supports(N, w, use_xpos=False) or not (on_tpu or INTERPRET):
        return _jnp_reference(qkv, heads, dim_head, window_size, causal,
                              exact_windowsize, use_rotary)
    C = CHUNK
    nc = N // C

    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dh, 2, dtype=np.float32) / dh))
    freqs = jnp.asarray(np.concatenate([inv_freq, inv_freq])[None, :])

    kernel = functools.partial(
        _kernel, w=w, lb=lb, lf=lf, C=C, nc=nc, h=h, dh=dh,
        causal=causal, exact=exact_windowsize, use_rotary=use_rotary,
    )
    blk = (1, C, 3 * h * dh)
    cur = pl.BlockSpec(blk, lambda i, c: (i, c, 0), memory_space=pltpu.VMEM)
    prev = pl.BlockSpec(
        blk, lambda i, c: (i, jnp.maximum(c - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    nxt = pl.BlockSpec(
        blk, lambda i, c: (i, jnp.minimum(c + 1, nc - 1), 0),
        memory_space=pltpu.VMEM,
    )
    fspec = pl.BlockSpec((1, dh), lambda i, c: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, h * dh), qkv.dtype),
        grid=(B, nc),
        in_specs=[cur, prev, nxt, fspec],
        out_specs=pl.BlockSpec(
            (1, C, h * dh), lambda i, c: (i, c, 0), memory_space=pltpu.VMEM
        ),
        interpret=INTERPRET,
    )(qkv, qkv, qkv, freqs)
    return out


def _fwd(qkv, heads, dim_head, window_size, causal, exact_windowsize,
         use_rotary):
    out = _forward(qkv, heads, dim_head, window_size, causal,
                   exact_windowsize, use_rotary)
    return out, (qkv,)


def _bwd(heads, dim_head, window_size, causal, exact_windowsize, use_rotary,
         res, g):
    """Exact gradients by differentiating the jnp reference."""
    (qkv,) = res

    def ref(qkv):
        return _jnp_reference(qkv, heads, dim_head, window_size, causal,
                              exact_windowsize, use_rotary)

    _, vjp = jax.vjp(ref, qkv)
    return vjp(g)


fused_qkv_local_attention.defvjp(_fwd, _bwd)
