"""Timestep samplers: uniform and loss-aware importance sampling.

Live rebuild of the reference's vendored guided-diffusion resample.py
(diffuser/models/resample.py:8-153 — dead code there, and the repo's only
torch.distributed call sites: `dist.all_gather` of per-rank loss histories
at resample.py:83-99). TPU-native translation:

- samplers are pure: (state, rng, batch) -> (t, weights, state'),
- the loss-second-moment sampler keeps a (T, history) ring buffer in a
  pytree state updated inside the jitted train step,
- the cross-host gather of per-rank losses becomes `jax.lax.all_gather`
  over the mesh's `data` axis when used under shard_map/pjit; in the
  single-process case the update is a plain scatter.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def uniform_timesteps(rng: jax.Array, batch: int, num_timesteps: int):
    """UniformSampler (resample.py:61-68): t ~ U{0..T-1}, weights 1."""
    t = jax.random.randint(rng, (batch,), 0, num_timesteps)
    return t, jnp.ones((batch,), jnp.float32)


class LossSecondMomentState(NamedTuple):
    """Ring buffer of recent losses per timestep
    (LossSecondMomentResampler, resample.py:124-153)."""

    losses: jnp.ndarray      # (T, history)
    counts: jnp.ndarray      # (T,) int32 filled entries

    @classmethod
    def create(cls, num_timesteps: int, history: int = 10):
        return cls(
            losses=jnp.zeros((num_timesteps, history), jnp.float32),
            counts=jnp.zeros((num_timesteps,), jnp.int32),
        )


def _warmed_up(state: LossSecondMomentState) -> jnp.ndarray:
    return (state.counts >= state.losses.shape[1]).all()


def loss_aware_weights(
    state: LossSecondMomentState, uniform_prob: float = 0.001
) -> jnp.ndarray:
    """Sampling distribution over timesteps: sqrt(E[loss^2]) normalized,
    mixed with uniform (resample.py:135-142); uniform until warmed up."""
    T = state.losses.shape[0]
    w = jnp.sqrt((state.losses**2).mean(axis=-1))
    w = w / jnp.maximum(w.sum(), 1e-20)
    w = w * (1 - uniform_prob) + uniform_prob / T
    return jnp.where(_warmed_up(state), w, jnp.full((T,), 1.0 / T))


def loss_aware_timesteps(
    state: LossSecondMomentState, rng: jax.Array, batch: int
):
    """Draw t from the loss-aware distribution; importance weights
    1/(T*p[t]) (resample.py:28-48)."""
    p = loss_aware_weights(state)
    t = jax.random.choice(rng, p.shape[0], (batch,), p=p)
    weights = 1.0 / (p.shape[0] * p[t])
    return t, weights


def update_with_losses(
    state: LossSecondMomentState,
    t: jnp.ndarray,
    losses: jnp.ndarray,
    axis_name: str | None = None,
) -> LossSecondMomentState:
    """Record per-sample losses into the ring buffer. With `axis_name`
    (inside shard_map/pjit over the data axis) every device contributes its
    local (t, loss) pairs via all_gather — the jax translation of the
    reference's dist.all_gather update (resample.py:83-99)."""
    if axis_name is not None:
        t = jax.lax.all_gather(t, axis_name).reshape(-1)
        losses = jax.lax.all_gather(losses, axis_name).reshape(-1)
        # gathered values carry the axis' "varying" type; mark the carried
        # state varying too so the scan carry types agree under shard_map
        def _vary(x):
            try:
                return jax.lax.pcast(x, axis_name, to="varying")
            except (AttributeError, TypeError):  # older jax
                return jax.lax.pvary(x, axis_name)

        state = jax.tree_util.tree_map(_vary, state)

    def record(state, pair):
        ti, li = pair
        hist = state.losses.shape[1]
        cnt = state.counts[ti]
        # ring: while warming, append; afterwards shift-left and append
        row = state.losses[ti]
        row = jnp.where(
            cnt < hist,
            row.at[jnp.minimum(cnt, hist - 1)].set(li),
            jnp.roll(row, -1).at[hist - 1].set(li),
        )
        return (
            LossSecondMomentState(
                losses=state.losses.at[ti].set(row),
                counts=state.counts.at[ti].set(jnp.minimum(cnt + 1, hist)),
            ),
            None,
        )

    state, _ = jax.lax.scan(record, state, (t, losses))
    return state
