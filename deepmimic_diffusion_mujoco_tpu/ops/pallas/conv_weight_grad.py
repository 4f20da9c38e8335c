"""Pallas TPU kernel: 1-D convolution weight gradient for the U-Net's
bottom-resolution shape (VERDICT r4 next-round item 6 — the last
train-MFU headroom axis, closed by measurement this round).

The headline train step's largest low-MFU items are the weight-grad convs
of the k=5 / 1024-channel / H=20 bottom level (~200 us each at ~34% MFU in
the round-3 trace; BASELINE "Train-step time breakdown"). XLA lowers the
filter-gradient as an implicit GEMM whose small spatial extent (20) forces
padded tiles and data-formatting copies around it.

This kernel reorganizes the reduction so the MXU sees ONE large
contraction per tap instead of H-striped small ones:

- operands go time-major: x (B, Hp, Cin) -> (Hp*B, Cin) and
  dy (B, H, Cout) -> (H*B, Cout), where Hp = H + k - 1 (SAME padding
  pre-applied). In this layout tap t's input rows are the CONTIGUOUS
  slice [t*B, (t+1+H-1)*B) — no gather, no im2col copy;
- dW[t] = X_t^T @ dY is then a (Cin, K=H*B) x (K, Cout) matmul with
  K = 1280 at the target shape — a deep MXU contraction instead of a
  rank-20 update;
- all k taps share the same dy block resident in VMEM (the jnp/XLA form
  re-reads dy per tap from HBM unless fusion catches it).

The grid tiles (Cin, Cout); the time-major transposes are part of the
jitted program (and of the benchmark timing — they are the honest cost of
the layout choice).

Measured verdict (scripts/bench_weight_grad_conv.py, v5e): see
benchmarks/weight_grad_conv_r5.json and the BASELINE note. The kernel is
NOT wired into the model by default unless it wins end-to-end; this module
is the decision-grade experiment the round-4 verdict asked for.

Reference workload anchor: archive/0_temporal_unet_diffusion_v2.ipynb
(TemporalUnet dim 128 -> 1024-channel bottom blocks, helpers.py:50-75
Conv1dBlock k=5).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False


def _kernel(x_ref, dy_ref, out_ref, *, k, H, B):
    """One (Cin_blk, Cout_blk) tile: k tap-matmuls over the shared dy.

    x_ref: (Hp*B, Cin_blk); dy_ref: (H*B, Cout_blk);
    out_ref: (k, Cin_blk, Cout_blk)."""
    dy = dy_ref[...]
    for t in range(k):
        xt = x_ref[t * B:(t + H) * B, :]
        out_ref[t] = jax.lax.dot_general(
            xt, dy, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def conv1d_weight_grad(x, dy, k: int, block_cin: int = 512,
                       block_cout: int = 256):
    # default tile (512, 256): the (512, 512) tile's double-buffered
    # operands + (k, 512, 512) f32 output block exceeded the 16M scoped
    # VMEM limit (18.79M) on v5e
    """dL/dW for a SAME-padded 1-D conv y[b,h,co] = sum_{t,ci}
    w[t,ci,co] * x_pad[b,h+t,ci].

    x: (B, H, Cin), dy: (B, H, Cout) -> (k, Cin, Cout) float32.
    """
    B, H, Cin = x.shape
    Cout = dy.shape[-1]
    pad_l = (k - 1) // 2
    pad_r = k - 1 - pad_l
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
    Hp = H + k - 1
    # time-major flatten: rows ordered h-major then b, so tap t's H*B input
    # rows are one contiguous slice
    x2 = jnp.moveaxis(xp, 1, 0).reshape(Hp * B, Cin)
    dy2 = jnp.moveaxis(dy, 1, 0).reshape(H * B, Cout)
    gi = -(-Cin // block_cin)
    go = -(-Cout // block_cout)
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, H=H, B=B),
        out_shape=jax.ShapeDtypeStruct((k, Cin, Cout), jnp.float32),
        grid=(gi, go),
        in_specs=[
            pl.BlockSpec((Hp * B, block_cin), lambda i, o: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H * B, block_cout), lambda i, o: (0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, block_cin, block_cout),
                               lambda i, o: (0, i, o),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(x2, dy2)
    return out


def conv1d_weight_grad_xla(x, dy, k: int):
    """XLA oracle: the filter gradient of the same SAME-padded conv, via
    the vjp of lax.conv_general_dilated (exactly what the train step's
    backward runs)."""
    pad_l = (k - 1) // 2
    pad_r = k - 1 - pad_l

    def conv(w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(pad_l, pad_r)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )

    w0 = jnp.zeros((k, x.shape[-1], dy.shape[-1]), x.dtype)
    _, vjp = jax.vjp(conv, w0)
    (dw,) = vjp(dy)
    return dw.astype(jnp.float32)
