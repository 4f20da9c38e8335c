"""Ablate the dynamics substep INSIDE a 17-length lax.scan to find where
the in-scan cost lives (engine.step measures ~13 ms/substep at N=4096 while
the same substep jitted alone measures ~0.7-6 ms)."""
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

    def scan17(body):
        def fn(qp, qv):
            def sub(c, _):
                return body(*c), None
            (qp, qv), _ = jax.lax.scan(sub, (qp, qv), None, length=17)
            return qp, qv
        return fn

    def timed(name, body):
        jitted = jax.jit(scan17(body))
        t0 = time.perf_counter()
        out = jitted(qpos, qvel)
        jax.block_until_ready(out)
        comp = time.perf_counter() - t0
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            out = jitted(qpos, qvel)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:36s} {best*1e3:9.2f} ms/17sub  "
              f"({best/17*1e3:6.2f} ms/sub, compile {comp:.0f}s)", flush=True)

    # full substep (= engine.step body)
    def full(qp, qv):
        tau = D.pd_torques(qp, qv, tgt)
        return jax.vmap(
            lambda a, b, c: D.step_physics(a, b, c, h, kd_extra=kd)
        )(qp, qv, tau)
    timed("full substep", full)

    # no solve: qacc = rhs / diag(M) proxy
    def no_solve(qp, qv):
        tau = D.pd_torques(qp, qv, tgt)

        def one(qpos1, qvel1, tau1):
            fk = D.fk_dynamics(qpos1)
            Jv, Jw = D.body_jacobians(fk)
            M = D.mass_matrix(fk)
            rhs = tau1 + D.passive_forces(qpos1, qvel1) - D.bias_forces(
                qpos1, qvel1, fk0=fk, JvJw=(Jv, Jw))
            rhs = rhs + D.limit_forces(qpos1, qvel1)
            tau_c, JWJ = D.contact_terms(fk, Jv, Jw, qvel1)
            rhs = rhs + tau_c
            qacc = rhs / (jnp.diagonal(M + h * JWJ) + 1.0)
            qvel2 = qvel1 + h * qacc
            return D.integrate_qpos(qpos1, qvel2, h), qvel2

        return jax.vmap(one)(qp, qv, tau)
    timed("no solve (diag proxy)", no_solve)

    # solve only: fixed M from frame qpos, rhs from qvel
    M0 = jax.jit(jax.vmap(lambda q: D.mass_matrix(D.fk_dynamics(q))))(qpos)
    M0 = M0 + 0.1 * jnp.eye(D.NV)[None]

    def solve_only(qp, qv):
        rhs = qv * 1.0001
        x = jax.vmap(D.spd_solve_unrolled)(M0, rhs)
        return qp + 0.0 * qp, x
    timed("unrolled solve only", solve_only)

    def solve_lapack(qp, qv):
        import jax.scipy.linalg as jsl
        rhs = qv * 1.0001

        def one(Mi, ri):
            return jsl.cho_solve(jsl.cho_factor(Mi), ri)
        x = jax.vmap(one)(M0, rhs)
        return qp + 0.0 * qp, x
    timed("cholesky-custom-call solve only", solve_lapack)

    # no contacts
    def no_contacts(qp, qv):
        tau = D.pd_torques(qp, qv, tgt)
        return jax.vmap(
            lambda a, b, c: D.step_physics(
                a, b, c, h, contacts=False, kd_extra=kd)
        )(qp, qv, tau)
    timed("no contacts", no_contacts)

    # no bias forces
    def no_bias(qp, qv):
        tau = D.pd_torques(qp, qv, tgt)

        def one(qpos1, qvel1, tau1):
            fk = D.fk_dynamics(qpos1)
            Jv, Jw = D.body_jacobians(fk)
            M = D.mass_matrix(fk)
            rhs = tau1 + D.passive_forces(qpos1, qvel1)
            rhs = rhs + D.limit_forces(qpos1, qvel1)
            tau_c, JWJ = D.contact_terms(fk, Jv, Jw, qvel1)
            rhs = rhs + tau_c
            Dm = jnp.diag(jnp.concatenate(
                [jnp.zeros((6,)), jnp.full((D.NJ,), D.JOINT_DAMPING) + kd]))
            qacc = D.spd_solve_unrolled(M + h * (Dm + JWJ), rhs)
            qvel2 = qvel1 + h * qacc
            return D.integrate_qpos(qpos1, qvel2, h), qvel2

        return jax.vmap(one)(qp, qv, tau)
    timed("no bias (rest same)", no_bias)


if __name__ == "__main__":
    main()
