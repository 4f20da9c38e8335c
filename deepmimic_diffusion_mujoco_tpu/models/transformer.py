"""MDM-style transformer-encoder denoiser (stack B's main model).

Re-design of the reference `TransformerMotionModel`
(diffuser/models/transformer_temporal.py:53-155):

- pose_embed Linear(input -> latent), learned absolute position embedding,
  MDM sinusoidal timestep embedding + 2-layer SiLU MLP added to every token,
  N post-norm transformer encoder layers (torch nn.TransformerEncoderLayer
  semantics: ReLU feed-forward, LayerNorm AFTER each residual), final Linear.

Intentional fixes over the reference (documented, not replicated):

- the reference constructs `nn.TransformerEncoderLayer` without
  `batch_first=True` and feeds (B, T, D), so torch attends across the BATCH
  axis instead of time (transformer_temporal.py:78-81,146-148); here
  attention is over the time axis as intended;
- class conditioning exists but is commented out in the reference
  (transformer_temporal.py:70,138-141) even though its trainer does 10%
  label drop for CFG (train_transformer.py:279-282); here it is a working
  `num_classes > 0` option with the null label = num_classes (label drop /
  unconditional branch), which is what makes CFG actually do something;
- an optional padding mask argument supports the jagged multi-clip batches
  (motion_dataset_v2) that the reference pads host-side.

TPU notes: attention/matmuls run in `dtype` (bfloat16 recommended) on the
MXU; params and the final output stay float32.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .embeddings import mdm_timestep_embedding


class EncoderLayer(nn.Module):
    """Post-norm torch-style encoder layer."""

    n_heads: int
    dim_feedforward: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            dtype=self.dtype,
            dropout_rate=self.dropout,
            deterministic=deterministic,
        )(x, x, mask=mask)
        x = nn.LayerNorm(dtype=self.dtype)(x + attn)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype)(h)
        return nn.LayerNorm(dtype=self.dtype)(x + h)


class AdaLNEncoderLayer(nn.Module):
    """Pre-norm encoder layer with adaLN-zero conditioning (DiT / MDM
    style): the class+time embedding modulates each LayerNorm's scale and
    shift and gates each residual branch, with the modulation projection
    ZERO-initialized so every layer starts as identity.

    Why (VERDICT r4 weak #4): additive conditioning tops out — the round-4
    class-MLP model plateaued at class accuracy 0.67 because a single
    added vector must survive 8 post-norm layers; per-layer FiLM gives the
    label a multiplicative path into every block. The reference cannot
    express this at all (its transformer ignores `y`,
    transformer_temporal.py:70,138-141)."""

    n_heads: int
    dim_feedforward: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c, mask=None, deterministic=True):
        D = x.shape[-1]
        mod = nn.Dense(
            6 * D, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="adaln_mod",
        )(nn.silu(c))  # (B, 6D)
        (sa_shift, sa_scale, sa_gate,
         ff_shift, ff_scale, ff_gate) = jnp.split(mod[:, None, :], 6, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype)(x)
        h = h * (1.0 + sa_scale) + sa_shift
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            dtype=self.dtype,
            dropout_rate=self.dropout,
            deterministic=deterministic,
        )(h, h, mask=mask)
        x = x + sa_gate * attn
        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype)(x)
        h = h * (1.0 + ff_scale) + ff_shift
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(D, dtype=self.dtype)(h)
        return x + ff_gate * h


class TransformerMotionModel(nn.Module):
    input_dim: int
    latent_dim: int = 256
    n_heads: int = 4
    num_layers: int = 8
    dropout: float = 0.1
    dim_feedforward: int = 1024
    max_sequence_length: int = 128
    num_classes: int = 0
    # "add": the round-4 additive class-MLP path (checkpoint-compatible);
    # "adaln": per-layer FiLM of the norms by class+time with adaLN-zero
    # init (AdaLNEncoderLayer) — DiT-style, conditioning only through the
    # modulations;
    # "both": additive class/time tokens AND per-layer adaLN modulation —
    # the label reaches the stream through two independent paths
    conditioning: str = "add"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time, y=None, mask=None, deterministic=True):
        """x: (B, T, input_dim), time: (B,), y: (B,) int32 or None.

        y == num_classes (or y is None) selects the learned null-label
        embedding — the unconditional branch for classifier-free guidance.
        mask: (B, T) 1.0 on valid frames.
        """
        B, T, _ = x.shape
        adaln = self.conditioning in ("adaln", "both")
        add_tokens = self.conditioning in ("add", "both")
        h = nn.Dense(self.latent_dim, dtype=self.dtype, name="pose_embed")(x)

        t_emb = mdm_timestep_embedding(time, self.latent_dim)
        t_emb = nn.Dense(self.latent_dim, dtype=self.dtype, name="time_embed_0")(t_emb)
        t_emb = nn.silu(t_emb)
        t_emb = nn.Dense(self.latent_dim, dtype=self.dtype, name="time_embed_1")(t_emb)
        if add_tokens:
            h = h + t_emb[:, None, :]

        pos = self.param(
            "position_embed",
            nn.initializers.normal(1.0),
            (self.max_sequence_length, self.latent_dim),
        )
        h = h + pos[None, :T, :].astype(self.dtype)

        cond = t_emb  # adaLN conditioning vector (time, + class below)
        if self.num_classes > 0:
            cls = nn.Embed(
                self.num_classes + 1, self.latent_dim, dtype=self.dtype,
                name="class_embed",
            )
            if y is None:
                y = jnp.full((B,), self.num_classes, jnp.int32)
            c = cls(jnp.clip(y, 0, self.num_classes))
            # round 4: the raw additive embedding trained to norm ~1 against
            # token vectors of norm ~20 (pos_emb init std 1.0 over 512 dims)
            # — class conditioning measured ~6% of output and samples
            # collapsed to a walk-ish mean for every label (cfg_eval on
            # allclips12k_r4). Route the class vector through its own
            # 2-layer SiLU MLP, MDM-style (the reference's commented-out
            # intent, transformer_temporal.py:70,138-141, was also an
            # embedding fused with the time token): the MLP gives training
            # an easy path to amplify the class signal to whatever scale
            # the denoiser needs.
            c = nn.Dense(self.latent_dim, dtype=self.dtype,
                         name="class_embed_0")(c)
            c = nn.silu(c)
            c = nn.Dense(self.latent_dim, dtype=self.dtype,
                         name="class_embed_1")(c)
            if add_tokens:
                h = h + c[:, None, :]
            if adaln:
                cond = cond + c

        attn_mask = None
        if mask is not None:
            # keys at padded frames are masked for every query
            attn_mask = mask[:, None, None, :].astype(bool)
        for i in range(self.num_layers):
            if adaln:
                h = AdaLNEncoderLayer(
                    self.n_heads, self.dim_feedforward, self.dropout,
                    dtype=self.dtype, name=f"layer_{i}",
                )(h, cond, attn_mask, deterministic)
            else:
                h = EncoderLayer(
                    self.n_heads, self.dim_feedforward, self.dropout,
                    dtype=self.dtype, name=f"layer_{i}",
                )(h, attn_mask, deterministic)

        if adaln:
            # DiT-style final modulation, zero-init: at init the output
            # head sees a plain normed stream
            fmod = nn.Dense(
                2 * self.latent_dim, dtype=self.dtype,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                name="final_mod",
            )(nn.silu(cond))
            f_shift, f_scale = jnp.split(fmod[:, None, :], 2, axis=-1)
            h = nn.LayerNorm(use_bias=False, use_scale=False,
                             dtype=self.dtype)(h)
            h = h * (1.0 + f_scale) + f_shift
        out = nn.Dense(self.input_dim, dtype=self.dtype, name="final_layer")(h)
        return out.astype(jnp.float32)
