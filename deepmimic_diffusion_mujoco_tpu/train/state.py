"""Functional train state: params + optimizer + EMA as one pytree.

Replaces both reference trainers' mutable state
(diffuser/utils/training.py:16-99 EMA class + Adam;
train_transformer.py:25-50 EMA, 229-251 optimizer/scheduler factory):

- EMA is a pure pytree lerp, `ema = decay*ema + (1-decay)*params`, with the
  reference's warmup semantics (copy before `ema_start` steps, update every
  `ema_every` steps — training.py:91-99,116-117) expressed with lax.cond so
  the whole update stays inside one jitted step,
- optimizers/schedules are optax (adam/adamw x cosine/linear/exponential,
  matching train_transformer.py:229-251,120-141).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import optax


@dataclass(frozen=True)
class EMAConfig:
    decay: float = 0.995
    start: int = 2000       # copy params before this step (training.py:93-95)
    every: int = 10         # update cadence (training.py:116-117)


def make_optimizer(
    kind: str = "adam",
    lr: float = 2e-5,
    weight_decay: float = 0.0,
    betas: tuple[float, float] = (0.9, 0.999),
    schedule: str | None = None,
    num_train_steps: int = 10000,
    schedule_kwargs: dict | None = None,
) -> optax.GradientTransformation:
    """Optimizer factory mirroring DiffusionTrainer._create_optimizer /
    _create_scheduler (train_transformer.py:229-251,120-141)."""
    kw = schedule_kwargs or {}
    if schedule == "cosine":
        lr_s = optax.cosine_decay_schedule(lr, num_train_steps, alpha=kw.get("alpha", 0.0))
    elif schedule == "linear":
        lr_s = optax.linear_schedule(lr, kw.get("end_lr", 0.0), num_train_steps)
    elif schedule == "exponential":
        lr_s = optax.exponential_decay(lr, kw.get("decay_steps", 1000), kw.get("decay_rate", 0.99))
    elif schedule is None:
        lr_s = lr
    else:
        raise ValueError(f"unknown schedule {schedule!r}")
    if kind == "adam":
        return optax.adam(lr_s, b1=betas[0], b2=betas[1])
    if kind == "adamw":
        return optax.adamw(lr_s, b1=betas[0], b2=betas[1], weight_decay=weight_decay)
    raise ValueError(f"unknown optimizer {kind!r}")


@dataclass
class TrainState:
    step: jnp.ndarray          # () int32
    params: Any
    opt_state: Any
    ema_params: Any
    ema: EMAConfig = field(default=EMAConfig())

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, ema: EMAConfig = EMAConfig()):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            ema=ema,
        )

    def apply_gradients(self, grads, tx: optax.GradientTransformation) -> "TrainState":
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        step = self.step + 1
        ema = self.ema

        def lerp(e, p):
            return e * ema.decay + p * (1.0 - ema.decay)

        def update_ema(_):
            return jax.tree_util.tree_map(lerp, self.ema_params, new_params)

        def copy_params(_):
            return new_params

        def keep(_):
            return self.ema_params

        due = (step % ema.every) == 0
        new_ema = jax.lax.cond(
            due,
            lambda _: jax.lax.cond(step < ema.start, copy_params, update_ema, None),
            keep,
            None,
        )
        return TrainState(step=step, params=new_params, opt_state=new_opt,
                          ema_params=new_ema, ema=ema)


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.step, s.params, s.opt_state, s.ema_params), s.ema),
    lambda ema, leaves: TrainState(*leaves, ema=ema),
)
