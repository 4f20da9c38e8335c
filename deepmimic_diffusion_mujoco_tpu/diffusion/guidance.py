"""Value-guided sampling (Diffuser machinery the reference carries but
never invokes — diffuser/sampling/functions.py:10-43, guides.py:6-21,
policies.py:11-57; SURVEY.md section 2.4 last row).

Rebuilt as pure functions: the per-step guidance is gradient ascent of a
value model on the trajectory, scaled by the posterior variance, with
conditioning re-applied after each nudge. `guided_sample_loop` is the
lax.scan composition with the stack-A posterior step.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from .process import posterior_step, predict_start_from_noise
from .sampling import SampleResult
from .schedules import Schedule, extract

# value_fn(x, t) -> (B,) scalar values
ValueFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def value_gradients(value_fn: ValueFn, x, t):
    """(y, dy/dx) of the value model (guides.py:16-21)."""
    def total(xx):
        y = value_fn(xx, t)
        return y.sum(), y

    grad, y = jax.grad(total, has_aux=True)(x)
    return y, grad


def guided_step(
    sched: Schedule,
    model_fn,
    value_fn: ValueFn,
    x,
    t,
    rng,
    *,
    scale: float = 0.001,
    t_stopgrad: int = 0,
    n_guide_steps: int = 1,
    scale_grad_by_std: bool = True,
    predict_epsilon: bool = True,
    conditioning_fn=None,
):
    """n_step_guided_p_sample (functions.py:10-43): nudge x up the value
    gradient n times, then take the posterior step."""
    nd = x.ndim
    var = jnp.exp(extract(sched.posterior_log_variance_clipped, t, nd))

    def nudge(x, _):
        y, grad = value_gradients(value_fn, x, t)
        if scale_grad_by_std:
            grad = var * grad
        grad = jnp.where(
            (t < t_stopgrad).reshape((-1,) + (1,) * (nd - 1)), 0.0, grad
        )
        x = x + scale * grad
        if conditioning_fn is not None:
            x = conditioning_fn(x)
        return x, y

    x, ys = jax.lax.scan(nudge, x, None, length=n_guide_steps)
    pred = model_fn(x, t)
    x0_hat = predict_start_from_noise(sched, x, t, pred) if predict_epsilon else pred
    noise = jax.random.normal(rng, x.shape, x.dtype)
    return posterior_step(sched, x, t, x0_hat, noise), ys[-1]


@partial(
    jax.jit,
    static_argnames=(
        "model_fn", "value_fn", "shape", "scale", "t_stopgrad",
        "n_guide_steps", "scale_grad_by_std", "predict_epsilon",
        "conditioning_fn", "sort",
    ),
)
def guided_sample_loop(
    sched: Schedule,
    model_fn,
    value_fn: ValueFn,
    shape,
    rng,
    *,
    scale: float = 0.001,
    t_stopgrad: int = 0,
    n_guide_steps: int = 1,
    scale_grad_by_std: bool = True,
    predict_epsilon: bool = True,
    conditioning_fn=None,
    sort: bool = True,
):
    """Full guided reverse chain; returns trajectories sorted by final value
    descending (the reference's sort_by_values, diffusion.py:32-41)."""
    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, shape, jnp.float32)
    if conditioning_fn is not None:
        x = conditioning_fn(x)

    def step(carry, t_scalar):
        x, rng = carry
        rng, step_rng = jax.random.split(rng)
        t = jnp.full((shape[0],), t_scalar, jnp.int32)
        x, values = guided_step(
            sched, model_fn, value_fn, x, t, step_rng,
            scale=scale, t_stopgrad=t_stopgrad, n_guide_steps=n_guide_steps,
            scale_grad_by_std=scale_grad_by_std,
            predict_epsilon=predict_epsilon, conditioning_fn=conditioning_fn,
        )
        return (x, rng), values

    (x, _), values = jax.lax.scan(
        step, (x, rng), jnp.arange(sched.num_timesteps - 1, -1, -1)
    )
    final_values = values[-1]
    if sort:
        order = jnp.argsort(-final_values)
        x = x[order]
        final_values = final_values[order]
    return SampleResult(trajectories=x, chain=None), final_values


def value_diffusion_loss(sched: Schedule, value_fn_params, x0, target_values, t, rng):
    """ValueDiffusion training (diffusion.py:283-297): predict the target
    value from a noised trajectory; MSE."""
    value_fn, params = value_fn_params

    def model(x, tt):
        return value_fn(params, x, tt)

    from .process import q_sample

    noise = jax.random.normal(rng, x0.shape, x0.dtype)
    x_noisy = q_sample(sched, x0, t, noise)
    pred = model(x_noisy, t)
    return ((pred - target_values) ** 2).mean(), {}
