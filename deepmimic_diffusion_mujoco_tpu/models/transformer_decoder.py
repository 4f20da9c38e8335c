"""Decoder-style transformer denoiser with learned sequence queries.

Re-design of the reference's self-contained tuning model
`TransformerMotionModel` in diffuser/models/transformer_temporal_new.py:38-176
(the model whose best config — dim 256, 4 heads, 4 layers — tops
best_configs.txt:4-21). The reference bundles its own diffusion math into
the module; here the model is ONLY the denoiser — its schedule/loss/sampling
live in the shared engine (diffusion/), with its angle+velocity loss in
process.angle_velocity_loss.

Architecture (transformer_temporal_new.py:85-176):
- input Linear + fixed sinusoidal sequence positional encoding,
- conv branch for local joint interactions (2x Conv1d k3 + ReLU) added in,
- timestep embedding = sinusoidal MLP + learned per-timestep embedding,
- learned per-frame queries (seq_queries) + time embedding as decoder tgt,
- N transformer DECODER layers (gelu, dim_feedforward = 2*dim, post-norm,
  causal tgt mask) cross-attending to the encoded sequence,
- spatial-attention conv refinement, final Linear.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .embeddings import sinusoidal_pos_emb

NEG_INF = -1e9


def fixed_positional_encoding(length: int, dim: int) -> np.ndarray:
    """Interleaved sin/cos PE (transformer_temporal_new.py:6-21)."""
    position = np.arange(length)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, dim, 2) * (-np.log(10000.0) / dim))
    pe = np.zeros((length, dim), np.float32)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


class DecoderLayer(nn.Module):
    """Post-norm torch TransformerDecoderLayer (gelu)."""

    n_heads: int
    dim_feedforward: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, tgt_mask=None):
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dtype=self.dtype
        )(tgt, tgt, mask=tgt_mask)
        x = nn.LayerNorm(dtype=self.dtype)(tgt + sa)
        ca = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dtype=self.dtype
        )(x, memory)
        x = nn.LayerNorm(dtype=self.dtype)(x + ca)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype)(x)
        h = nn.gelu(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype)(h)
        return nn.LayerNorm(dtype=self.dtype)(x + h)


class ConvBranch(nn.Module):
    """k3 Conv1d stack over time (transformer_temporal_new.py:118-131)."""

    layers: int = 2
    final_relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, D) channel-last (TPU layout)
        D = x.shape[-1]
        for i in range(self.layers):
            x = nn.Conv(D, (3,), padding=1, dtype=self.dtype)(x)
            if self.final_relu or i < self.layers - 1:
                x = nn.relu(x)
        return x


class TransformerDecoderMotionModel(nn.Module):
    horizon: int
    transition_dim: int
    dim: int = 512
    n_heads: int = 8
    num_layers: int = 8
    n_timesteps: int = 1000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time, y=None):
        """x: (B, L, transition_dim), time: (B,) -> predicted noise."""
        del y
        B, L, _ = x.shape
        h = nn.Dense(self.dim, dtype=self.dtype, name="input_process")(x)
        pe = fixed_positional_encoding(max(L, self.horizon), self.dim)
        h = h + jnp.asarray(pe[:L], self.dtype)[None]
        h = h + ConvBranch(2, final_relu=True, dtype=self.dtype,
                           name="conv_local")(h)

        t_emb = sinusoidal_pos_emb(time, self.dim)
        t_emb = nn.Dense(self.dim, dtype=self.dtype, name="embed_timestep_0")(t_emb)
        t_emb = nn.silu(t_emb)
        t_emb = nn.Dense(self.dim, dtype=self.dtype, name="embed_timestep_1")(t_emb)
        learned_t = nn.Embed(self.n_timesteps, self.dim, dtype=self.dtype,
                             name="learned_time_embed")(time.astype(jnp.int32))
        t_emb = t_emb + learned_t

        queries = self.param(
            "seq_queries", nn.initializers.normal(1.0), (self.horizon, self.dim)
        )
        tgt = queries[None, :L, :].astype(self.dtype) + t_emb[:, None, :]

        causal = np.tril(np.ones((L, L), bool))
        tgt_mask = jnp.asarray(causal)[None, None]
        for i in range(self.num_layers):
            tgt = DecoderLayer(
                self.n_heads, 2 * self.dim, dtype=self.dtype, name=f"dec_{i}"
            )(tgt, h, tgt_mask)

        tgt = tgt + ConvBranch(2, final_relu=False, dtype=self.dtype,
                               name="spatial_attn")(tgt)
        out = nn.Dense(self.transition_dim, dtype=self.dtype,
                       name="output_process")(tgt)
        return out.astype(jnp.float32)
