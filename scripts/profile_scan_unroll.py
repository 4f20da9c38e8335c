"""Compare lax.scan vs unrolled substep loops for DynamicsEnv.step."""
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

    def with_scan(qp, qv):
        def sub(c, _):
            return body(*c), None
        (qp, qv), _ = jax.lax.scan(sub, (qp, qv), None, length=17)
        return qp, qv

    def with_scan_unroll(qp, qv):
        def sub(c, _):
            return body(*c), None
        (qp, qv), _ = jax.lax.scan(sub, (qp, qv), None, length=17, unroll=True)
        return qp, qv

    def with_python_loop(qp, qv):
        for _ in range(17):
            qp, qv = body(qp, qv)
        return qp, qv

    def timed(name, fn):
        jitted = jax.jit(fn)
        print(f"compiling {name}...", flush=True)
        t0 = time.perf_counter()
        out = jitted(qpos, qvel)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            out = jitted(qpos, qvel)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:24s} {best*1e3:9.2f} ms   (compile {compile_s:.1f} s)"
              f"   -> {N/best:,.0f} env-steps/s")
        return out

    o1 = timed("lax.scan", with_scan)
    o2 = timed("lax.scan unroll=True", with_scan_unroll)
    print("max |scan - unroll|:",
          float(jnp.abs(o1[0] - o2[0]).max()))


if __name__ == "__main__":
    main()
