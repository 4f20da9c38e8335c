"""Dynamics-engine layout shootout: vmap (dense) vs lanes (dense, env-last)
vs aba (O(n) Featherstone) on the PhysicsTrackingEnv rollout shape used by
bench.py (N envs, n_steps control steps of 17 substeps as one scan).
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
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--layouts", default="aba,vmap")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deepmimic_diffusion_mujoco_tpu.data.mocap import load_clip
    from deepmimic_diffusion_mujoco_tpu.physics.env import PhysicsTrackingEnv

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    clip = load_clip(os.path.join(REPO, "data/motions/humanoid3d_walk.txt"))

    for layout in args.layouts.split(","):
        env = PhysicsTrackingEnv(clip.qpos, clip.qvel, layout=layout)
        state = env.reset(args.n)
        t0 = time.perf_counter()
        s2, rs = env.rollout(state, args.steps)
        jax.block_until_ready(rs)
        compile_s = time.perf_counter() - t0
        if not bool(jnp.isfinite(rs).all()):
            print(f"{layout:6s} NON-FINITE REWARDS — garbage throughput")
            continue
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            s2, rs = env.rollout(state, args.steps)
            jax.block_until_ready(rs)
            best = min(best, time.perf_counter() - t0)
        rate = args.n * args.steps / best
        print(f"{layout:6s} {best*1e3:9.1f} ms/rollout  "
              f"{rate:12,.0f} env-steps/s  "
              f"(reward mean {float(rs.mean()):.3f}, compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
