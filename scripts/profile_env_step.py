"""Timing of the full PhysicsTrackingEnv step vs its parts at N envs.

The isolated vmapped substep times ~0.66 ms at N=4096 (profile_dynamics),
which implies ~360k env-steps/s at 17 substeps — but bench_physics measures
~20k. This script isolates where the gap lives: the 17-substep scan
(DynamicsEnv.step), the tracking reward, and the env bookkeeping.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deepmimic_diffusion_mujoco_tpu.data.mocap import load_clip
    from deepmimic_diffusion_mujoco_tpu.physics.env import (
        PhysicsTrackingEnv,
        tracking_reward,
    )

    clip = load_clip(os.path.join(REPO, "data/motions/humanoid3d_walk.txt"))
    env = PhysicsTrackingEnv(clip.qpos, clip.qvel)
    N = args.n
    state = env.reset(N)

    def timed(name, fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:32s} {best*1e3:9.2f} ms")
        return best

    # full env step (jit cached on the instance)
    t_env = timed("env.step (17 substeps+reward)", env.step, state)

    # the 17-substep dynamics scan alone
    tgt = env.motion[(state.frame + 1) % env.num_frames]
    t_dyn = timed("engine.step (17-substep scan)", env.engine.step,
                  state.qpos, state.qvel, tgt)

    # reward alone
    rew = jax.jit(lambda qp, qv, t, tv: tracking_reward(qp, qv, t, tv))
    t_rew = timed("tracking_reward", rew, state.qpos, state.qvel, tgt,
                  env.vel[(state.frame + 1) % env.num_frames])

    print(f"implied env-steps/s from env.step: {N / t_env:,.0f}")
    print(f"scan accounts for {t_dyn / t_env:.0%}; reward {t_rew / t_env:.0%}")


if __name__ == "__main__":
    main()
