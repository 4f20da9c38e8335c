"""Build models / schedules / losses / samplers from an ExperimentConfig.

The functional replacement for DiffusionTrainer._create_model /
_create_diffusion (train_transformer.py:152-227) and the notebooks' pickled
Config factories (diffuser/utils/config.py:22-69): everything is
reconstructable from one JSON document, which is also what checkpoint
metadata stores for architecture autodetect.
"""
from __future__ import annotations

import jax.numpy as jnp

from .diffusion.schedules import Schedule, make_schedule
from .models.local_attention import LocalTransformer
from .models.temporal_unet import TemporalUnet
from .models.transformer import TransformerMotionModel
from .models.transformer_decoder import TransformerDecoderMotionModel
from .train.config import DiffusionConfig, ExperimentConfig, ModelConfig


def build_model(cfg: ModelConfig):
    dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
    if cfg.architecture == "transformer":
        return TransformerMotionModel(
            input_dim=cfg.input_dim, latent_dim=cfg.latent_dim,
            n_heads=cfg.n_heads, num_layers=cfg.num_layers,
            dropout=cfg.dropout,
            dim_feedforward=cfg.dim_feedforward,
            max_sequence_length=cfg.max_seq_len,
            num_classes=cfg.num_classes,
            conditioning=cfg.conditioning, dtype=dtype,
        )
    if cfg.architecture == "temporal":
        return TemporalUnet(
            transition_dim=cfg.input_dim, dim=cfg.channel_dim,
            dim_mults=tuple(cfg.dim_mults), attention=cfg.attention,
            # auto (None) = off: the conv+GN+Mish kernel measured slower
            # than XLA's conv codegen end-to-end (BASELINE.md)
            use_pallas=bool(cfg.use_pallas),
            dtype=dtype,
        )
    if cfg.architecture == "local_attention":
        return LocalTransformer(
            input_dim=cfg.input_dim, max_seq_len=cfg.max_seq_len,
            dim=cfg.latent_dim, depth=cfg.depth, heads=cfg.n_heads,
            dim_head=cfg.dim_head, window_size=cfg.window_size,
            causal=cfg.causal, use_xpos=cfg.use_xpos,
            num_residual_streams=cfg.num_residual_streams,
            attn_dropout=cfg.attn_dropout, ff_dropout=cfg.ff_dropout,
            use_dynamic_pos_bias=cfg.use_dynamic_pos_bias,
            use_global_attn=cfg.use_global_attn,
            global_attn_layers=tuple(cfg.global_attn_layers),
            num_classes=cfg.num_classes,
            # None = "auto": the measured policy (kernel for training
            # shapes and above the inference crossover — see LocalMHA)
            use_pallas=(cfg.use_pallas if cfg.use_pallas is not None
                        else "auto"),
            dtype=dtype,
        )
    if cfg.architecture == "decoder":
        return TransformerDecoderMotionModel(
            horizon=cfg.max_seq_len, transition_dim=cfg.input_dim,
            dim=cfg.latent_dim, n_heads=cfg.n_heads,
            num_layers=cfg.num_layers, dtype=dtype,
        )
    raise ValueError(f"unknown architecture {cfg.architecture!r}")


def build_schedule(cfg: DiffusionConfig) -> Schedule:
    return make_schedule(
        kind=cfg.schedule_type, timesteps=cfg.noise_steps,
        beta_start=cfg.beta_start, beta_end=cfg.beta_end,
        cosine_s=cfg.cosine_s, convention=cfg.convention,
    )


def build_experiment(cfg: ExperimentConfig):
    """-> (model, schedule). Training/eval wire the rest from cfg."""
    return build_model(cfg.model), build_schedule(cfg.diffusion)
