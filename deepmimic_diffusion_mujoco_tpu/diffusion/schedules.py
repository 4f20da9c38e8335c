"""Noise schedules and derived coefficient tables.

One pure function family replaces the reference's two divergent schedule
conventions (SURVEY.md section 7 "Hard parts"):

- "diffuser" cosine: clip betas to [0, 0.999]
  (diffuser/models/helpers.py:145-157),
- "v4" cosine: clip betas to [beta_start, beta_end]
  (diffuser/models/diffusion_v4.py:26-42),
- "v4" linear: linspace(beta_start, beta_end)
  (diffusion_v4.py:28-29).

All coefficients are precomputed float32 arrays; inside a jitted step they
are gathered per-timestep (`extract`, helpers.py:139-142).
"""
from __future__ import annotations

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp
import numpy as np


def cosine_betas(
    timesteps: int,
    s: float = 0.008,
    clip: tuple[float, float] = (0.0, 0.999),
    convention: str = "diffuser",
) -> np.ndarray:
    """Nichol & Dhariwal cosine schedule.

    ``convention="diffuser"`` uses x = linspace(0, T+1, T+1) (an off-by-one
    the reference inherits from Diffuser, helpers.py:150-152);
    ``convention="v4"`` uses x = linspace(0, T, T+1) (diffusion_v4.py:33-36).
    """
    steps = timesteps + 1
    if convention == "diffuser":
        x = np.linspace(0, steps, steps)
        denom = steps
    elif convention == "v4":
        x = np.linspace(0, timesteps, steps)
        denom = timesteps
    else:
        raise ValueError(f"unknown cosine convention {convention!r}")
    alphas_cumprod = np.cos(((x / denom) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, clip[0], clip[1]).astype(np.float64)


def linear_betas(timesteps: int, beta_start: float = 1e-4, beta_end: float = 0.02) -> np.ndarray:
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)


@dataclass(frozen=True)
class Schedule:
    """All q/posterior coefficients, derived once from betas.

    Field set mirrors GaussianDiffusion's registered buffers
    (diffuser/models/diffusion.py:63-110) so every formula used anywhere in
    the reference is expressible from this one table.
    """

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])

    @classmethod
    def from_betas(cls, betas: np.ndarray, dtype=jnp.float32) -> "Schedule":
        betas = np.asarray(betas, dtype=np.float64)
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.concatenate([[1.0], acp[:-1]])
        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        a = lambda x: jnp.asarray(x, dtype=dtype)
        return cls(
            betas=a(betas),
            alphas=a(alphas),
            alphas_cumprod=a(acp),
            alphas_cumprod_prev=a(acp_prev),
            sqrt_alphas_cumprod=a(np.sqrt(acp)),
            sqrt_one_minus_alphas_cumprod=a(np.sqrt(1.0 - acp)),
            sqrt_recip_alphas_cumprod=a(np.sqrt(1.0 / acp)),
            sqrt_recipm1_alphas_cumprod=a(np.sqrt(1.0 / acp - 1.0)),
            posterior_variance=a(post_var),
            posterior_log_variance_clipped=a(np.log(np.maximum(post_var, 1e-20))),
            posterior_mean_coef1=a(betas * np.sqrt(acp_prev) / (1.0 - acp)),
            posterior_mean_coef2=a((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
        )


# Registered as a pytree so a Schedule can flow through jit / scan / vmap as
# an ordinary argument (all fields are leaves).
jax.tree_util.register_pytree_node(
    Schedule,
    lambda s: (tuple(getattr(s, f.name) for f in fields(Schedule)), None),
    lambda _, leaves: Schedule(*leaves),
)


def make_schedule(
    kind: str = "cosine",
    timesteps: int = 1000,
    beta_start: float = 1e-4,
    beta_end: float = 0.02,
    cosine_s: float = 0.008,
    convention: str = "diffuser",
    dtype=jnp.float32,
) -> Schedule:
    if kind == "cosine":
        clip = (0.0, 0.999) if convention == "diffuser" else (beta_start, beta_end)
        betas = cosine_betas(timesteps, cosine_s, clip, convention)
    elif kind == "linear":
        betas = linear_betas(timesteps, beta_start, beta_end)
    else:
        raise ValueError(f"unknown schedule kind {kind!r}")
    return Schedule.from_betas(betas, dtype=dtype)


def extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients, broadcastable to an ndim tensor."""
    out = table[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))
