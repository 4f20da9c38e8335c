"""Timestep / positional / rotary embeddings shared by the denoiser zoo."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sinusoidal_pos_emb(x: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Diffuser-style [sin | cos] embedding (helpers.py:17-29).

    x: (B,) float timesteps -> (B, dim).
    """
    half = dim // 2
    freq = jnp.exp(np.log(10000.0) / (half - 1) * -jnp.arange(half))
    ang = x[:, None].astype(jnp.float32) * freq[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def mdm_timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """MDM-style [cos | sin] embedding (transformer_temporal.py:7-26).

    Note the cos-first order and /half frequency spacing — both differ from
    :func:`sinusoidal_pos_emb`; each model keeps its own convention for
    parity with its reference counterpart.
    """
    half = dim // 2
    freq = jnp.exp(-np.log(max_period) * jnp.arange(half) / half)
    ang = t[:, None].astype(jnp.float32) * freq[None, :]
    emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def rotary_angles(seq_len: int, dim: int, base: float = 10000.0) -> jnp.ndarray:
    """(seq_len, dim/2) rotary angles (rotary.py:11-47)."""
    inv_freq = 1.0 / (base ** (jnp.arange(0, dim, 2) / dim))
    return jnp.arange(seq_len)[:, None] * inv_freq[None, :]


def apply_rotary(x: jnp.ndarray, angles: jnp.ndarray, scale: jnp.ndarray | float = 1.0) -> jnp.ndarray:
    """Rotate feature pairs; x: (..., seq, dim), angles: (seq, dim/2).

    Matches rotate_half/apply_rotary_pos_emb (rotary.py:50-66) with xpos
    scale support (scale=1 for plain rotary).
    """
    a = jnp.concatenate([angles, angles], axis=-1)  # duplicated like the ref
    x1, x2 = jnp.split(x, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * jnp.cos(a) * scale + rotated * jnp.sin(a) * scale


def xpos_scale(seq_len: int, dim: int, scale_base: float) -> jnp.ndarray:
    """xpos length-extrapolation scale (rotary.py:20-47): (seq, dim/2)."""
    scale = (jnp.arange(0, dim, 2) + 0.4 * dim) / (1.4 * dim)
    power = (jnp.arange(seq_len) - seq_len // 2) / scale_base
    return scale[None, :] ** power[:, None]
