"""Env throughput vs batch size N for both dynamics layouts.

The substep graph is a chain of ~hundreds of small kernels; at N=4096 each
kernel is dispatch-latency-bound (~20 us/kernel vs ~2 us of data movement),
so throughput should scale nearly linearly with N until HBM bandwidth
binds — at which point the env-last layout (no tile padding) should pull
ahead of the vmap layout."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    from deepmimic_diffusion_mujoco_tpu.data.mocap import load_clip
    from deepmimic_diffusion_mujoco_tpu.physics.env import PhysicsTrackingEnv

    clip = load_clip(os.path.join(REPO, "data/motions/humanoid3d_walk.txt"))
    for layout in ("lanes", "vmap"):
        env = PhysicsTrackingEnv(clip.qpos, clip.qvel, layout=layout)
        for N in (4096, 16384, 65536):
            state = env.reset(N)
            state2, r = env.step(state)
            jax.block_until_ready(r)
            best = float("inf")
            for _ in range(3):
                s = state
                t0 = time.perf_counter()
                for _ in range(5):
                    s, r = env.step(s)
                jax.block_until_ready(r)
                best = min(best, time.perf_counter() - t0)
            rate = N * 5 / best
            print(f"{layout:6s} N={N:6d}  {best/5*1e3:8.2f} ms/step  "
                  f"{rate:12,.0f} env-steps/s", flush=True)


if __name__ == "__main__":
    main()
