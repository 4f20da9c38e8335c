"""Dump optimized HLO + cost analysis for one dynamics substep (both
layouts) so the dominant ops/shapes are inspectable offline."""
from __future__ import annotations

import os
import sys
from collections import Counter

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    from deepmimic_diffusion_mujoco_tpu.data.mocap import load_clip
    from deepmimic_diffusion_mujoco_tpu.physics import dynamics as D
    from deepmimic_diffusion_mujoco_tpu.physics import dynamics_lanes as L

    clip = load_clip(os.path.join(REPO, "data/motions/humanoid3d_walk.txt"))
    N = 4096
    idx = np.arange(N) % clip.qpos.shape[0]
    qpos = jnp.asarray(clip.qpos[idx], jnp.float32)
    qvel = jnp.asarray(clip.qvel[idx], jnp.float32)
    tgt = jnp.asarray(clip.qpos[(idx + 1) % clip.qpos.shape[0]], jnp.float32)
    h = 1.0 / 30.0 / 17.0
    kd = jnp.asarray(D.PD_KD, jnp.float32)

    def body_vmap(qp, qv):
        tau = D.pd_torques(qp, qv, tgt)
        return jax.vmap(
            lambda a, b, c: D.step_physics(a, b, c, h, kd_extra=kd)
        )(qp, qv, tau)

    tgt_T = tgt.T

    def body_lanes(qp_T, qv_T):
        tau_T = L.pd_torques_lanes(qp_T, qv_T, tgt_T)
        return L.step_physics_lanes(qp_T, qv_T, tau_T, h, kd_extra=kd)

    for name, fn, args in (
        ("vmap", body_vmap, (qpos, qvel)),
        ("lanes", body_lanes, (qpos.T, qvel.T)),
    ):
        compiled = jax.jit(fn).lower(*args).compile()
        txt = compiled.as_text()
        path = f"/tmp/substep_{name}.hlo"
        with open(path, "w") as f:
            f.write(txt)
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        ops = Counter()
        for line in txt.splitlines():
            line = line.strip()
            if "=" in line and not line.startswith(("HloModule", "ENTRY", "}", "ROOT %")):
                rhs = line.split("=", 1)[1].strip()
                # opcode appears after the shape: "f32[...]{...} opcode("
                parts = rhs.split(" ")
                for p in parts[1:3]:
                    p = p.strip()
                    if p and p[0].isalpha():
                        ops[p.split("(")[0]] += 1
                        break
        print(f"== {name}: flops={ca.get('flops', float('nan')):.3e} "
              f"bytes={ca.get('bytes accessed', float('nan')):.3e} "
              f"(dumped {path}, {len(txt.splitlines())} lines)")
        for op, cnt in ops.most_common(15):
            print(f"   {op:24s} {cnt}")


if __name__ == "__main__":
    main()
