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

Round-2.1 (after the first TPU measurement, which won at H>=256 but lost
at the live H=128 / w=16 shape): the key set per 128-row query chunk is
trimmed to what the window structure can actually reach —

- nc == 1 (H == 128): a single block attends to itself; no neighbor
  blocks are fetched at all (the naive version wasted 2/3 of its compute
  on fully-masked duplicate blocks);
- C % w == 0: neighbor contributions are w-row SLICES of the adjacent
  chunks (w = the full look-back / look-forward reach per side), so the
  key count is C + 2w instead of 3C — for w=16 that is 160 vs 384 keys
  (2.4x less MXU and VMEM work);
- otherwise: whole-neighbor-block fallback (keys = 3C).

What the fusion removes vs the XLA path (models/local_attention.py):
the `(B, h, nw, jw, dh)` looked-around key/value tensors (a 3x HBM blowup
at look_backward=look_forward=1), the bucketed q/k/v reshapes, and the
per-window similarity/attention intermediates.

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


def _window_mask(ti, tj, w, lb, lf, causal, exact, invalid):
    wi, wj = ti // w, tj // w
    bad = (wj < wi - lb) | (wj > wi + lf) | invalid
    if causal:
        bad |= ti < tj
        if exact:
            bad |= ti > tj + w * lb
    elif exact:
        bad |= (tj - w * lf > ti) | (ti > tj + w * lb)
    return bad


def _rot(x, cos, sin, dh):
    x1 = x[:, : dh // 2]
    x2 = x[:, dh // 2:]
    rx = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rx * sin


def _attend_heads(qkv_c_ref, k_parts, v_parts, out_ref, bad, q_pos, k_pos,
                  freq_ref, *, h, dh, use_rotary):
    """Shared inner loop: per-head QK^T -> mask -> softmax -> PV.

    k_parts/v_parts: list of (ref, col_offset_base, rows) whose row-concat
    forms this chunk's key/value set, in k_pos order.
    """
    scale = dh ** -0.5
    if use_rotary:
        q_ang = q_pos.astype(jnp.float32) * freq_ref[0][None, :]
        k_ang = k_pos.reshape(-1, 1).astype(jnp.float32) * freq_ref[0][None, :]
        q_cos, q_sin = jnp.cos(q_ang), jnp.sin(q_ang)
        k_cos, k_sin = jnp.cos(k_ang), jnp.sin(k_ang)
    hd = h * dh
    for head in range(h):
        o = head * dh
        q = qkv_c_ref[0, :, o:o + dh].astype(jnp.float32) * scale
        k = jnp.concatenate(
            [r[0, :, hd + o:hd + o + dh] for r in k_parts], axis=0
        ).astype(jnp.float32)
        v = jnp.concatenate(
            [r[0, :, 2 * hd + o:2 * hd + o + dh] for r in v_parts], axis=0
        ).astype(jnp.float32)
        if use_rotary:
            q = _rot(q, q_cos, q_sin, dh)
            k = _rot(k, k_cos, k_sin, dh)
        sim = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        sim = jnp.where(bad, NEG_INF, sim)
        p = jax.nn.softmax(sim, axis=-1)
        out_ref[0, :, o:o + dh] = jnp.dot(
            p, v, preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


def _kernel_single(qkv_ref, freq_ref, out_ref, *, w, lb, lf, C, h, dh,
                   causal, exact, use_rotary):
    """nc == 1: the whole sequence is one chunk attending to itself."""
    i_pos = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    j_pos = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    bad = _window_mask(i_pos, j_pos, w, lb, lf, causal, exact, False)
    _attend_heads(qkv_ref, [qkv_ref], [qkv_ref], out_ref, bad,
                  i_pos + lf * w, j_pos, freq_ref,
                  h=h, dh=dh, use_rotary=use_rotary)


def _kernel_sliced(qkv_c_ref, qkv_p_ref, qkv_n_ref, freq_ref, out_ref,
                   *, w, lb, lf, C, P, N, nc, h, dh, causal, exact,
                   use_rotary):
    """General case: keys = P-row tail of prev chunk + own chunk + P-row
    head of next chunk (P = w slice when aligned, else full C)."""
    c = pl.program_id(1)
    K = C + 2 * P
    i_pos = c * C + jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    # start rows of the fetched neighbor slices (mirror the BlockSpec
    # index-map clamping so masked positions match the delivered rows)
    prev_start = jnp.maximum(c * C - P, 0)
    next_start = jnp.minimum((c + 1) * C, N - P)
    seg = (j >= P).astype(jnp.int32) + (j >= P + C).astype(jnp.int32)
    j_pos = jnp.where(
        seg == 0, prev_start + j,
        jnp.where(seg == 1, c * C + (j - P), next_start + (j - P - C)),
    )
    invalid = ((seg == 0) & (c == 0)) | ((seg == 2) & (c == nc - 1))
    bad = _window_mask(i_pos, j_pos, w, lb, lf, causal, exact, invalid)
    _attend_heads(qkv_c_ref, [qkv_p_ref, qkv_c_ref, qkv_n_ref],
                  [qkv_p_ref, qkv_c_ref, qkv_n_ref], out_ref, bad,
                  i_pos + lf * w, j_pos, freq_ref,
                  h=h, dh=dh, use_rotary=use_rotary)


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
    fspec = pl.BlockSpec((1, dh), lambda i, c: (0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, N, h * dh), qkv.dtype)
    out_spec = pl.BlockSpec(
        (1, C, h * dh), lambda i, c: (i, c, 0), memory_space=pltpu.VMEM
    )

    if nc == 1:
        kernel = functools.partial(
            _kernel_single, w=w, lb=lb, lf=lf, C=C, h=h, dh=dh,
            causal=causal, exact=exact_windowsize, use_rotary=use_rotary,
        )
        cur = pl.BlockSpec((1, C, 3 * h * dh), lambda i, c: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, out_shape=out_shape, grid=(B, 1),
            in_specs=[cur, fspec], out_specs=out_spec,
            interpret=INTERPRET,
        )(qkv, freqs)

    # neighbor reach is ONE window each way (lb = lf = 1): a query in this
    # chunk can touch at most the last w rows of the previous chunk and the
    # first w rows of the next, so fetch w-row slices when the chunk is
    # w-aligned, else whole neighbor chunks
    P = w if C % w == 0 else C
    npb = N // P  # neighbor-granularity block count
    cpp = C // P  # P-blocks per chunk
    kernel = functools.partial(
        _kernel_sliced, w=w, lb=lb, lf=lf, C=C, P=P, N=N, nc=nc, h=h, dh=dh,
        causal=causal, exact=exact_windowsize, use_rotary=use_rotary,
    )
    cur = pl.BlockSpec((1, C, 3 * h * dh), lambda i, c: (i, c, 0),
                       memory_space=pltpu.VMEM)
    prev = pl.BlockSpec(
        (1, P, 3 * h * dh),
        lambda i, c: (i, jnp.maximum(c * cpp - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    nxt = pl.BlockSpec(
        (1, P, 3 * h * dh),
        lambda i, c: (i, jnp.minimum((c + 1) * cpp, npb - 1), 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel, out_shape=out_shape, grid=(B, nc),
        in_specs=[cur, prev, nxt, fspec], out_specs=out_spec,
        interpret=INTERPRET,
    )(qkv, qkv, qkv, freqs)


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
