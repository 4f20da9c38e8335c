"""Pallas TPU kernel: fused Conv1d(k) + GroupNorm + Mish.

The temporal U-Net's hot block (models/temporal_unet.py Conv1dBlock,
rebuilt from diffuser/models/helpers.py:50-68) is conv -> groupnorm ->
mish: three HBM round-trips when unfused. This kernel keeps one batch
row's activations in VMEM and:

- computes the k-tap "same" conv as k shifted (H, Cin) @ (Cin, Cout) MXU
  matmuls accumulated in f32,
- normalizes per GroupNorm group over (H, channels/group) in-register,
- applies Mish (x * tanh(softplus(x))) on the VPU,

writing the block's output once. The backward pass recomputes through the
jnp reference via custom_vjp (exact gradients, fused forward).

Shapes: x (B, H, Cin), weights (k, Cin, Cout), bias (Cout,), gamma/beta
(Cout,). Requires Cout % groups == 0; falls back to the jnp reference off
TPU or for shapes the layout doesn't fit.

MEASURED (TPU v5e, bs 32 x H 160, U-Net dim 128, bf16): XLA's native conv
codegen wins at these activation sizes (1.26 ms vs 2.43 ms full-model fwd)
— the activations are ~80 KB, so there is no HBM-traffic win to fuse away,
and one-(batch*row)-per-program underutilizes the MXU. The kernel is kept
(exact parity 2e-6, tested) for wide-channel configs and as the
explicitly-benchmarked alternative the build plan calls for
(SURVEY.md section 7 step 6); `use_pallas` defaults to False for the
U-Net, True is profitable for the windowed-attention kernel instead.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False


def conv_gn_mish_reference(x, w, b, gamma, beta, groups: int, eps: float = 1e-5):
    """jnp reference (and backward path): channel-last conv + GN + Mish."""
    k = w.shape[0]
    pad = k // 2
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + b
    B, H, C = out.shape
    g = out.reshape(B, H, groups, C // groups)
    mean = g.mean(axis=(1, 3), keepdims=True)
    var = ((g - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    normed = ((g - mean) / jnp.sqrt(var + eps)).reshape(B, H, C)
    out = normed * gamma + beta
    return out * jnp.tanh(jax.nn.softplus(out))


def _kernel(x_ref, w_ref, b_ref, gamma_ref, beta_ref, out_ref,
            *, H: int, k: int, groups: int, eps: float):
    Cin = x_ref.shape[-1]
    Cout = out_ref.shape[-1]
    pad = k // 2
    x = x_ref[0]                                            # (H, Cin)

    # im2col: one (H, k*Cin) @ (k*Cin, Cout) MXU product instead of k small
    # ones. Shifted copies via static slice+concat (pltpu.roll lowers to an
    # unsupported dynamic rotate for unaligned row widths); out-of-range
    # rows are zeroed so the wrap contributes nothing ("same" padding).
    cols = []
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)
    for tap in range(k):
        shift = tap - pad
        s = shift % H
        rolled = jnp.concatenate([x[s:], x[:s]], axis=0) if s else x
        src = rows + shift
        valid = (src >= 0) & (src < H)
        cols.append(jnp.where(valid, rolled, 0.0))
    im2col = jnp.concatenate(cols, axis=-1)               # (H, k*Cin)
    wmat = w_ref[:].reshape(k * Cin, Cout)
    acc = jnp.dot(im2col, wmat, preferred_element_type=jnp.float32)
    acc = acc + b_ref[0][None, :].astype(jnp.float32)

    # GroupNorm via matmul group-reduction (Mosaic-friendly: no 3-D
    # reshapes): one-hot (Cout, groups) routes channel sums to groups.
    cg = Cout // groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (Cout, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (Cout, groups), 1)
    onehot = (ch // cg == gr).astype(jnp.float32)           # (Cout, groups)
    ones_h = jnp.ones((1, H), jnp.float32)
    csum = jnp.dot(ones_h, acc, preferred_element_type=jnp.float32)      # (1, Cout)
    csumsq = jnp.dot(ones_h, acc * acc, preferred_element_type=jnp.float32)
    n = float(H * cg)
    gmean = jnp.dot(csum, onehot, preferred_element_type=jnp.float32) / n     # (1, G)
    gmeansq = jnp.dot(csumsq, onehot, preferred_element_type=jnp.float32) / n
    mean_c = jnp.dot(gmean, onehot.T, preferred_element_type=jnp.float32)     # (1, Cout)
    var_c = jnp.dot(gmeansq, onehot.T, preferred_element_type=jnp.float32) - mean_c**2
    normed = (acc - mean_c) * jax.lax.rsqrt(var_c + eps)
    out = normed * gamma_ref[0][None, :] + beta_ref[0][None, :]
    out = out * jnp.tanh(jax.nn.softplus(out))
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def conv_gn_mish(x, w, b, gamma, beta, groups: int = 8, eps: float = 1e-5):
    return _forward(x, w, b, gamma, beta, groups, eps)


def _forward(x, w, b, gamma, beta, groups, eps):
    on_tpu = jax.default_backend() == "tpu"
    B, H, Cin = x.shape
    k, _, Cout = w.shape
    if not (on_tpu or INTERPRET) or Cout % groups:
        return conv_gn_mish_reference(x, w, b, gamma, beta, groups, eps)
    kernel = functools.partial(_kernel, H=H, k=k, groups=groups, eps=eps)
    row = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, Cout), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            row((k, Cin, Cout)),
            row((1, Cout)),
            row((1, Cout)),
            row((1, Cout)),
        ],
        out_specs=pl.BlockSpec((1, H, Cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(x, w, b[None], gamma[None], beta[None])
    return out


def _fwd(x, w, b, gamma, beta, groups, eps):
    return _forward(x, w, b, gamma, beta, groups, eps), (x, w, b, gamma, beta)


def _bwd(groups, eps, res, g):
    x, w, b, gamma, beta = res

    def ref(x, w, b, gamma, beta):
        return conv_gn_mish_reference(x, w, b, gamma, beta, groups, eps)

    _, vjp = jax.vjp(ref, x, w, b, gamma, beta)
    return vjp(g)


conv_gn_mish.defvjp(_fwd, _bwd)
