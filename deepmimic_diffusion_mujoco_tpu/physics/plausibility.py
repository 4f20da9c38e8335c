"""Physical-plausibility scoring of motion tracks on the dynamics engine.

The reference judges sampled motions by eye in the MuJoCo viewer
(README.md:77-86: "not physically accurate" kinematic playback). With a
real forward-dynamics engine available (dynamics.py), a stronger, fully
automatic check exists: PD-track the motion on the physics engine
(DeepMimic's imitation setup) and measure how well the simulated character
keeps up. Physically consistent motions track with high reward; motions
with impossible accelerations, interpenetrations or balance-free poses
lose the character quickly.

`track_motions` scores a BATCH of independent motions (each its own target
trajectory — unlike PhysicsTrackingEnv, which tracks one shared clip), as
one jitted scan over time. Velocities for the reward's joint-velocity term
are finite-differenced from the track (only hinge velocities enter the
DeepMimic velocity term)."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .dynamics import DynamicsEnv, pd_torques  # noqa: F401 (pd re-export)
from .env import tracking_reward


def _joint_velocities(motions: jnp.ndarray, dt: float) -> jnp.ndarray:
    """(B, T, 35) -> (B, T, 34) finite-difference velocities: root rows 0
    (unused by the reward's velocity term), hinge rows forward-difference
    with the last frame holding the previous value."""
    B, T, _ = motions.shape
    joints = motions[:, :, 7:]
    dj = (joints[:, 1:] - joints[:, :-1]) / dt
    dj = jnp.concatenate([dj, dj[:, -1:]], axis=1)           # (B, T, 28)
    root = jnp.zeros((B, T, 6), motions.dtype)
    return jnp.concatenate([root, dj], axis=-1)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _rollout(motions, substeps: int, dt: float, fall_height: float):
    engine = DynamicsEnv(dt=dt, substeps=substeps)
    vels = _joint_velocities(motions, dt)
    qpos = motions[:, 0]
    qvel = vels[:, 0]
    done0 = jnp.zeros((motions.shape[0],), bool)

    # time-major targets for the scan: track frame t at step t
    tgt_q = jnp.moveaxis(motions[:, 1:], 1, 0)               # (T-1, B, 35)
    tgt_v = jnp.moveaxis(vels[:, 1:], 1, 0)

    def step(carry, tgt):
        qp, qv, done = carry
        t_q, t_v = tgt
        qp2, qv2 = engine.step(qp, qv, t_q)
        qp2 = jnp.where(done[:, None], qp, qp2)
        qv2 = jnp.where(done[:, None], qv, qv2)
        r = tracking_reward(qp2, qv2, t_q, t_v)
        fell = qp2[:, 2] < fall_height
        done = done | fell
        r = jnp.where(done, 0.0, r)
        return (qp2, qv2, done), (r, done)

    (_, _, done), (rewards, dones) = jax.lax.scan(
        step, (qpos, qvel, done0), (tgt_q, tgt_v))
    return rewards, dones                                    # (T-1, B)


def track_motions(
    motions: np.ndarray | jnp.ndarray,
    dt: float = 1.0 / 30.0,
    substeps: int = 17,
    fall_height: float = 0.3,
    horizon: int | None = None,
) -> dict:
    """Score motions (B, T, 35) [or (T, 35)] by physics PD-tracking.

    Returns per-motion arrays and scalar summaries:
      reward_mean    — mean tracking reward over surviving steps (B,)
      survival_steps — control steps before the character fell (B,)
      survived       — fraction of motions upright through the horizon
      reward_curve   — (T-1,) batch-mean reward per control step
    `horizon` truncates scoring to the first `horizon` control steps
    (open-loop PD has no balance feedback, so even ground-truth mocap
    topples after ~20 steps — comparisons should use a fixed horizon;
    tests pin the walk clip's own score as the reference point)."""
    m = jnp.asarray(motions, jnp.float32)
    if m.ndim == 2:
        m = m[None]
    if horizon is not None:
        m = m[:, : horizon + 1]
    rewards, dones = _rollout(m, substeps, dt, fall_height)
    rewards = np.asarray(rewards)                            # (T-1, B)
    dones = np.asarray(dones)
    alive = ~dones
    steps_alive = alive.sum(0)                               # (B,)
    denom = np.maximum(steps_alive, 1)
    reward_mean = (rewards * alive).sum(0) / denom
    # single-number score: reward integrated over the whole horizon with
    # fallen steps scored 0 — rewards early falls less than reward_mean does
    reward_auc = (rewards * alive).sum(0) / rewards.shape[0]
    return {
        "reward_mean": reward_mean,
        "reward_auc": reward_auc,
        "survival_steps": steps_alive,
        "survived": float(alive[-1].mean()),
        "reward_curve": rewards.mean(1),
        "summary": {
            "physics_reward_mean": float(reward_mean.mean()),
            "physics_reward_std": float(reward_mean.std()),
            "physics_reward_auc": float(reward_auc.mean()),
            "physics_survived_frac": float(alive[-1].mean()),
            "physics_survival_steps_mean": float(steps_alive.mean()),
        },
    }
