"""Stage-by-stage timing of the forward-dynamics substep at N envs.

Each stage is jitted in isolation and timed best-of-reps so we can see
where the 26 ms/substep (N=4096, round-2 bench: 9.1k env-steps/s) goes:
FK, Jacobians, mass matrix, bias (nested jvp), contacts, the implicit
solve, and the full substep for cross-checking.
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
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deepmimic_diffusion_mujoco_tpu.data.mocap import load_clip
    from deepmimic_diffusion_mujoco_tpu.physics import dynamics as D

    clip = load_clip(os.path.join(REPO, "data/motions/humanoid3d_walk.txt"))
    N = args.n
    idx = np.arange(N) % clip.qpos.shape[0]
    qpos = jnp.asarray(clip.qpos[idx], jnp.float32)
    qvel = jnp.asarray(clip.qvel[idx], jnp.float32)
    tau = jnp.zeros((N, D.NV), jnp.float32)
    h = 1.0 / 30.0 / 17.0

    def timed(name, fn, *a):
        jitted = jax.jit(fn)
        out = jitted(*a)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = jitted(*a)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:28s} {best*1e3:8.2f} ms")
        return best

    vfk = jax.vmap(D.fk_dynamics)
    fk = vfk(qpos)
    timed("fk", lambda q: vfk(q), qpos)
    vjac = jax.vmap(D.body_jacobians)
    Jv, Jw = vjac(fk)
    timed("jacobians (fk cached)", lambda f: vjac(f), fk)
    timed("mass_matrix (incl fk+jac)", lambda q: jax.vmap(
        lambda qq: D.mass_matrix(D.fk_dynamics(qq)))(q), qpos)
    timed("bias (nested jvp, fk reuse)", lambda q, v: jax.vmap(
        lambda a, b: D.bias_forces(a, b))(q, v), qpos, qvel)
    timed("contacts", lambda f, jv, jw, v: jax.vmap(D.contact_terms)(
        f, jv, jw, v), fk, Jv, Jw, qvel)

    # the solve in isolation: build M once, time cho_factor+cho_solve
    M = jax.jit(jax.vmap(lambda q: D.mass_matrix(D.fk_dynamics(q))))(qpos)
    rhs = jnp.asarray(np.random.default_rng(0).normal(size=(N, D.NV)),
                      jnp.float32)

    def solve(Ms, rs):
        import jax.scipy.linalg as jsl
        def one(Mi, ri):
            return jsl.cho_solve(jsl.cho_factor(Mi), ri)
        return jax.vmap(one)(Ms, rs)

    timed("cholesky solve", solve, M, rhs)

    vstep = jax.jit(lambda qp, qv, t: jax.vmap(
        lambda a, b, c: D.step_physics(a, b, c, h))(qp, qv, t))
    timed("full substep", lambda a, b, c: vstep(a, b, c), qpos, qvel, tau)

    env_rate = None
    t_sub = timed("full substep (again)", lambda a, b, c: vstep(a, b, c),
                  qpos, qvel, tau)
    env_rate = N / (t_sub * 17)
    print(f"implied env-steps/s @17 substeps: {env_rate:,.0f}")


if __name__ == "__main__":
    main()
