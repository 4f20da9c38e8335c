"""Marginal cost per substep: time the dynamics scan at several lengths.

Separates fixed per-call cost (dispatch/layout/tunnel) from the true
per-substep compute: slope of time vs scan length."""
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
    from deepmimic_diffusion_mujoco_tpu.physics import dynamics as D

    clip = load_clip(os.path.join(REPO, "data/motions/humanoid3d_walk.txt"))
    N = 4096
    idx = np.arange(N) % clip.qpos.shape[0]
    qpos = jnp.asarray(clip.qpos[idx], jnp.float32)
    qvel = jnp.asarray(clip.qvel[idx], jnp.float32)
    tgt = jnp.asarray(clip.qpos[(idx + 1) % clip.qpos.shape[0]], jnp.float32)
    h = 1.0 / 30.0 / 17.0
    kd = jnp.asarray(D.PD_KD, jnp.float32)

    def body(qp, qv):
        tau = D.pd_torques(qp, qv, tgt)
        return jax.vmap(
            lambda a, b, c: D.step_physics(a, b, c, h, kd_extra=kd)
        )(qp, qv, tau)

    results = []
    for L in (1, 2, 5, 9, 17):
        def fn(qp, qv, L=L):
            def sub(c, _):
                return body(*c), None
            (qp, qv), _ = jax.lax.scan(sub, (qp, qv), None, length=L)
            return qp, qv

        jitted = jax.jit(fn)
        out = jitted(qpos, qvel)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = jitted(qpos, qvel)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        results.append((L, best))
        print(f"L={L:3d}  {best*1e3:9.2f} ms", flush=True)

    (l1, t1), (l2, t2) = results[0], results[-1]
    slope = (t2 - t1) / (l2 - l1)
    fixed = t1 - slope * l1
    print(f"marginal per-substep: {slope*1e3:.2f} ms; fixed per call: "
          f"{fixed*1e3:.2f} ms")
    print(f"speed-of-light env-steps/s at 17 substeps (no fixed cost): "
          f"{N/(slope*17):,.0f}")


if __name__ == "__main__":
    main()
