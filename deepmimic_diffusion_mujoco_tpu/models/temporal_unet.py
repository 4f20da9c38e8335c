"""Temporal 1-D U-Net denoiser (flax.linen), TPU-first.

Re-design of the reference TemporalUnet (diffuser/models/temporal_v2.py:18-165;
v1 at temporal.py differs only in default dim=32):

- data layout stays (B, H, C) channel-last end-to-end — XLA's preferred conv
  layout on TPU (the reference rearranges to channel-first for cuDNN),
- Conv1dBlock = Conv -> GroupNorm(8) -> Mish (helpers.py:50-68),
- ResidualTemporalBlock adds a time-MLP FiLM-style bias (temporal_v2.py:18-46),
- per-resolution optional LinearAttention (helpers.py:110-136),
- Downsample: stride-2 conv k3; Upsample: transposed conv k4 s2
  (helpers.py:32-47),
- fully convolutional over the horizon: any H divisible by
  2**(len(dim_mults)-1) works, which is what enables the reference's
  0.75x/3x horizon projection behaviors (SURVEY.md section 2.4).

Compute dtype is configurable (bfloat16 on TPU for MXU throughput; params
stay float32).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .embeddings import sinusoidal_pos_emb


def mish(x):
    return x * jnp.tanh(nn.softplus(x))


class Conv1dBlock(nn.Module):
    out_channels: int
    kernel_size: int = 5
    n_groups: int = 8
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, C)
        # one param set for both compute paths, so `use_pallas` can flip at
        # inference on params trained either way
        from ..ops.pallas.conv_block_kernel import (
            conv_gn_mish,
            conv_gn_mish_reference,
        )

        w = self.param(
            "conv_kernel",
            nn.initializers.lecun_normal(in_axis=(0, 1), out_axis=2),
            (self.kernel_size, x.shape[-1], self.out_channels),
        )
        b = self.param("conv_bias", nn.initializers.zeros, (self.out_channels,))
        gamma = self.param("gn_scale", nn.initializers.ones, (self.out_channels,))
        beta = self.param("gn_bias", nn.initializers.zeros, (self.out_channels,))
        fn = conv_gn_mish if self.use_pallas else conv_gn_mish_reference
        return fn(
            x.astype(self.dtype), w.astype(self.dtype), b, gamma, beta,
            self.n_groups,
        )


class LinearAttention(nn.Module):
    """Softmax-kernel linear attention (helpers.py:110-136).

    O(H * d^2) instead of O(H^2 * d): keys are softmaxed over the horizon,
    a (d x d) context is built once, then queried — two MXU-friendly
    batched matmuls.
    """

    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, C)
        B, H, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1,), use_bias=False, dtype=self.dtype)(x)
        qkv = qkv.reshape(B, H, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, H, h, d)
        q = q * (self.dim_head ** -0.5)
        k = nn.softmax(k, axis=1)  # softmax over horizon (ref: dim=-1 on (b,h,c,n))
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(B, H, hidden)
        return nn.Conv(C, (1,), dtype=self.dtype)(out)


class PreNormResidualAttention(nn.Module):
    """Residual(PreNorm(LinearAttention)) with the reference's channel
    LayerNorm (biased variance over channels; helpers.py:86-108)."""

    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (1, 1, x.shape[-1]))
        b = self.param("b", nn.initializers.zeros, (1, 1, x.shape[-1]))
        mean = x.mean(axis=-1, keepdims=True)
        var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
        normed = (x - mean) / jnp.sqrt(var + 1e-5) * g + b
        return x + LinearAttention(self.heads, self.dim_head, dtype=self.dtype)(normed)


class ResidualTemporalBlock(nn.Module):
    out_channels: int
    kernel_size: int = 5
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb):  # x: (B,H,C), t_emb: (B,E)
        h = Conv1dBlock(self.out_channels, self.kernel_size,
                        use_pallas=self.use_pallas, dtype=self.dtype)(x)
        h = h + nn.Dense(self.out_channels, dtype=self.dtype)(mish(t_emb))[:, None, :]
        h = Conv1dBlock(self.out_channels, self.kernel_size,
                        use_pallas=self.use_pallas, dtype=self.dtype)(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1,), dtype=self.dtype)(x)
        return h + x


class ValueFunction(nn.Module):
    """Scalar value head over trajectories (temporal.py:168-254): the
    U-Net's down path + mid blocks, then a Dense head to one value per
    trajectory. Consumed by diffusion/guidance.py's value-guided sampler."""

    transition_dim: int
    dim: int = 32
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    out_dim: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time, y=None):
        del y
        dims = [self.dim * m for m in self.dim_mults]
        t = sinusoidal_pos_emb(time, self.dim)
        t = nn.Dense(self.dim * 4, dtype=self.dtype)(t)
        t = mish(t)
        t = nn.Dense(self.dim, dtype=self.dtype)(t)

        x = x.astype(self.dtype)
        for i, d in enumerate(dims):
            x = ResidualTemporalBlock(d, dtype=self.dtype)(x, t)
            x = ResidualTemporalBlock(d, dtype=self.dtype)(x, t)
            if i != len(dims) - 1:
                x = nn.Conv(d, (3,), strides=(2,), padding=1, dtype=self.dtype)(x)
        mid = dims[-1]
        x = ResidualTemporalBlock(mid // 2, dtype=self.dtype)(x, t)
        x = nn.Conv(mid // 2, (3,), strides=(2,), padding=1, dtype=self.dtype)(x)
        x = ResidualTemporalBlock(mid // 4, dtype=self.dtype)(x, t)
        x = nn.Conv(mid // 4, (3,), strides=(2,), padding=1, dtype=self.dtype)(x)
        x = x.reshape(x.shape[0], -1)
        h = nn.Dense(self.dim * 2, dtype=self.dtype)(jnp.concatenate([x, t], -1))
        h = mish(h)
        out = nn.Dense(self.out_dim, dtype=self.dtype)(h)
        return out.astype(jnp.float32)[..., 0] if self.out_dim == 1 else out


class TemporalUnet(nn.Module):
    transition_dim: int
    dim: int = 128            # v2 default (temporal_v2.py:56); v1 uses 32
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    attention: bool = False
    use_pallas: bool = False  # fused conv+GN+mish kernel (ops/pallas)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time, y=None):
        """x: (B, H, transition_dim), time: (B,) -> (B, H, transition_dim).

        `y` (class label) is accepted and ignored — the unified model
        signature across the zoo; the reference U-Net takes `cond` and
        ignores it too (temporal_v2.py:115).
        """
        del y
        down_factor = 2 ** (len(self.dim_mults) - 1)
        if x.shape[1] % down_factor:
            raise ValueError(
                f"horizon {x.shape[1]} must be divisible by {down_factor}"
            )
        dims = [self.dim * m for m in self.dim_mults]

        t = sinusoidal_pos_emb(time, self.dim)
        t = nn.Dense(self.dim * 4, dtype=self.dtype)(t)
        t = mish(t)
        t = nn.Dense(self.dim, dtype=self.dtype)(t)

        x = x.astype(self.dtype)
        skips = []
        n_res = len(dims)
        for i, d in enumerate(dims):
            is_last = i == n_res - 1
            x = ResidualTemporalBlock(d, use_pallas=self.use_pallas, dtype=self.dtype)(x, t)
            x = ResidualTemporalBlock(d, use_pallas=self.use_pallas, dtype=self.dtype)(x, t)
            if self.attention:
                x = PreNormResidualAttention(dtype=self.dtype)(x)
            skips.append(x)
            if not is_last:
                x = nn.Conv(d, (3,), strides=(2,), padding=1, dtype=self.dtype)(x)

        x = ResidualTemporalBlock(dims[-1], use_pallas=self.use_pallas, dtype=self.dtype)(x, t)
        if self.attention:
            x = PreNormResidualAttention(dtype=self.dtype)(x)
        x = ResidualTemporalBlock(dims[-1], use_pallas=self.use_pallas, dtype=self.dtype)(x, t)

        # Up path: one iteration per down-sampled resolution, each ending in
        # an upsample (temporal_v2.py:96-110 — `is_last` never triggers there,
        # so all three resolutions upsample; the full-res skip stays unused).
        for d in reversed(dims[:-1]):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResidualTemporalBlock(d, use_pallas=self.use_pallas, dtype=self.dtype)(x, t)
            x = ResidualTemporalBlock(d, use_pallas=self.use_pallas, dtype=self.dtype)(x, t)
            if self.attention:
                x = PreNormResidualAttention(dtype=self.dtype)(x)
            x = nn.ConvTranspose(
                d, (4,), strides=(2,), padding="SAME", dtype=self.dtype
            )(x)

        x = Conv1dBlock(self.dim, kernel_size=5, use_pallas=self.use_pallas, dtype=self.dtype)(x)
        x = nn.Conv(self.transition_dim, (1,), dtype=self.dtype)(x)
        return x.astype(jnp.float32)
