"""Reverse-diffusion sampling as one jitted `lax.scan`.

Replaces both reference sampler loops with a single engine:

- stack A `GaussianDiffusion.p_sample_loop` (diffuser/models/diffusion.py:
  187-228): Python loop over <=1000 steps, per-step `.item()` progress syncs,
  conditioning_fn re-applied after every step, `starting_motion` /
  `max_timesteps` / `return_chain` options;
- stack B `DiffusionV4.sample` (diffuser/models/diffusion_v4.py:82-149):
  loop ends at t == 1 (never runs the t=0 step — a reference quirk kept
  behind `mode="v4"`), classifier-free guidance lerp.

TPU-first design: the whole reverse chain is ONE compiled program — a
`lax.scan` whose carry is (x, rng); the denoiser forward, the schedule
gathers, the conditioning select, and the noise injection all fuse into a
single device loop with zero host round-trips (the reference syncs to host
every step for its progress bar).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .conditioning import Conditioner
from .process import (
    ddim_step,
    ddpm_step,
    posterior_step,
    predict_noise_from_start,
    predict_start_from_noise,
    predict_start_from_v,
)
from .schedules import Schedule

# Denoiser signature: (x, t, y) -> prediction (epsilon or x0 depending on
# the process configuration). `y` is an int32 class-label array; the
# unconditional branch passes `uncond_y` (by convention num_classes).
ModelFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray | None], jnp.ndarray]


class SampleResult(NamedTuple):
    trajectories: jnp.ndarray          # (B, H, D)
    chain: jnp.ndarray | None          # (steps, B, H, D) if return_chain


def _x0_and_eps(sched, x, t, pred, prediction: str):
    """Normalize any model output parameterization to (x0_hat, eps_hat)."""
    if prediction == "epsilon":
        x0 = predict_start_from_noise(sched, x, t, pred)
        return x0, pred
    if prediction == "x0":
        return pred, predict_noise_from_start(sched, x, t, pred)
    if prediction == "v":
        x0 = predict_start_from_v(sched, x, t, pred)
        return x0, predict_noise_from_start(sched, x, t, x0)
    raise ValueError(f"unknown prediction {prediction!r}")


def _model_prediction(
    model_fn: ModelFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    y: jnp.ndarray | None,
    cfg_scale: float | None,
    uncond_y: jnp.ndarray | None,
    cfg_batched: bool = True,
) -> jnp.ndarray:
    """One (optionally CFG-guided) denoiser evaluation.

    CFG is the reference's lerp (diffusion_v4.py:104-115):
    pred = uncond + cfg_scale * (cond - uncond).

    The reference runs cond and uncond as two sequential forwards
    (diffusion_v4.py:104-113). On TPU a sampling batch (B<=16 typically)
    underfeeds the MXU, so the default here stacks both branches into ONE
    2B-batch forward (mathematically identical: the models have no
    cross-batch coupling). `cfg_batched=False` keeps the two-call form for
    memory-constrained shapes.
    """
    if cfg_scale is None or uncond_y is None:
        return model_fn(x, t, y)
    if cfg_batched and y is not None:
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        y2 = jnp.concatenate(
            [jnp.broadcast_to(y, t.shape), jnp.broadcast_to(uncond_y, t.shape)],
            axis=0,
        )
        pred2 = model_fn(x2, t2, y2)
        cond, uncond = pred2[: x.shape[0]], pred2[x.shape[0]:]
    else:
        cond = model_fn(x, t, y)
        uncond = model_fn(x, t, uncond_y)
    return uncond + cfg_scale * (cond - uncond)


@partial(
    jax.jit,
    static_argnames=(
        # cfg_scale is deliberately NOT static: it only feeds the CFG lerp
        # arithmetic, and keeping it traced lets one compiled chain serve a
        # whole guidance-scale sweep (cfg_eval recompiled the full reverse
        # chain per scale before — ~90 cold tunnel compiles per report)
        "model_fn", "shape", "mode", "predict_epsilon", "prediction",
        "conditioning_fn", "t_start", "return_chain",
        "clip_denoised", "x_sharding", "ddim_steps", "eta", "cfg_batched",
    ),
)
def sample_loop(
    sched: Schedule,
    model_fn: ModelFn,
    shape: tuple[int, ...],
    rng: jax.Array,
    *,
    mode: str = "posterior",
    predict_epsilon: bool = True,
    prediction: str | None = None,
    conditioning_fn: Conditioner | None = None,
    starting_motion: jnp.ndarray | None = None,
    t_start: int | None = None,
    return_chain: bool = False,
    cfg_scale: float | None = None,
    y: jnp.ndarray | None = None,
    uncond_y: jnp.ndarray | None = None,
    clip_denoised: bool = False,
    x_sharding=None,
    ddim_steps: int | None = None,
    eta: float = 0.0,
    cfg_batched: bool = True,
) -> SampleResult:
    """Run the full reverse chain.

    mode="posterior": stack-A update x_{t-1} ~ q(x_{t-1} | x_t, x0_hat),
      noise zeroed at t == 0, loop t = t_start-1 .. 0.
    mode="v4": stack-B update (diffusion_v4.py:136-146), noise zeroed at
      t == 1, loop t = T-1 .. 1.
    mode="ddpm": the tuning model's loop (transformer_temporal_new.py:
      234-263): same update as v4 but running all the way to t = 0 with
      noise zeroed there.
    mode="ddim": strided deterministic (eta=0) or stochastic sampling over
      `ddim_steps` timesteps — the live replacement for the reference's
      vendored, import-broken respace.py.

    `prediction` ("epsilon" | "x0" | "v") names the model's output
    parameterization; default derives from `predict_epsilon` for
    reference-parity call sites. "v" is stack C's pred_v objective.

    `t_start` truncates the chain (reference `max_timesteps`,
    diffusion.py:195,210): with `starting_motion` this is the
    motion-to-motion translation behavior (shallow noising, few steps).
    `shape` may use any horizon divisible by the model's downsample factor —
    the 0.75x / 3x projection behaviors are just different `shape` values.

    `x_sharding` (a NamedSharding, e.g. parallel.mesh.seq_sharding) pins the
    trajectory layout each step — shard the HORIZON over the mesh's `seq`
    axis and XLA's SPMD partitioner inserts the halo exchanges for the
    U-Net's convolutions / local attention's look-around reads
    (ring-style neighbor collectives over ICI), scaling horizon past
    per-chip memory (SURVEY.md sections 2.10, 5).
    """
    T = sched.num_timesteps
    if t_start is None:
        t_start = T
    t_end = 1 if mode == "v4" else 0
    if prediction is None:
        prediction = "epsilon" if predict_epsilon else "x0"

    def pin(x):
        if x_sharding is not None:
            return jax.lax.with_sharding_constraint(x, x_sharding)
        return x

    rng, init_rng = jax.random.split(rng)
    if starting_motion is not None:
        x = jnp.broadcast_to(starting_motion, shape).astype(jnp.float32)
    else:
        x = jax.random.normal(init_rng, shape, jnp.float32)
    x = pin(x)
    if conditioning_fn is not None:
        x = conditioning_fn(x)

    if mode == "ddim":
        n = ddim_steps if ddim_steps is not None else t_start
        ts = jnp.linspace(0, t_start - 1, n).round().astype(jnp.int32)[::-1]
        ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], jnp.int32)])
        xs = jnp.stack([ts, ts_prev], axis=1)
    else:
        ts = jnp.arange(t_start - 1, t_end - 1, -1)
        xs = jnp.stack([ts, ts - 1], axis=1)

    def step(carry, t_pair):
        x, rng = carry
        t_scalar, t_prev_scalar = t_pair[0], t_pair[1]
        rng, noise_rng = jax.random.split(rng)
        t = jnp.full((shape[0],), t_scalar, jnp.int32)
        pred = _model_prediction(
            model_fn, x, t, y, cfg_scale, uncond_y, cfg_batched
        )
        noise = jax.random.normal(noise_rng, shape, jnp.float32)
        x0_hat, eps_hat = _x0_and_eps(sched, x, t, pred, prediction)
        if clip_denoised:  # diffusion.py:176-177
            x0_hat = jnp.clip(x0_hat, -1.0, 1.0)
            eps_hat = predict_noise_from_start(sched, x, t, x0_hat)
        if mode in ("v4", "ddpm"):
            # Reference zeroes noise on the final step (t==1 for v4,
            # diffusion_v4.py:141-144; t==0 for ddpm,
            # transformer_temporal_new.py:254).
            noise = jnp.where(t_scalar > t_end, 1.0, 0.0) * noise
            x = ddpm_step(sched, x, t, eps_hat, noise)
        elif mode == "ddim":
            t_prev = jnp.full((shape[0],), t_prev_scalar, jnp.int32)
            noise = jnp.where(t_prev_scalar >= 0, 1.0, 0.0) * noise
            x = ddim_step(sched, x, t, t_prev, x0_hat, eps_hat, noise, eta)
        else:
            x = posterior_step(sched, x, t, x0_hat, noise)
        if conditioning_fn is not None:
            x = conditioning_fn(x)
        x = pin(x)
        return (x, rng), (x if return_chain else None)

    (x, _), chain = jax.lax.scan(step, (x, rng), xs)
    return SampleResult(trajectories=x, chain=chain)


def make_sampler(
    sched: Schedule,
    model_apply: Callable,
    params,
    **kwargs,
):
    """Bind params into a ModelFn and return a closure over sample_loop.

    `model_apply(params, x, t, y)` is the flax apply; the returned callable
    takes (shape, rng, **overrides).
    """
    def model_fn(x, t, y):
        return model_apply(params, x, t, y)

    def sampler(shape, rng, **overrides):
        merged = {**kwargs, **overrides}
        return sample_loop(sched, model_fn, shape, rng, **merged)

    return sampler
