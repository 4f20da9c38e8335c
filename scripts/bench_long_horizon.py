"""Long-horizon sampling benchmark (VERDICT round-3 item 6): samples/s vs
horizon for the LocalTransformer live architecture, fused Pallas windowed
attention vs the XLA path — the end-to-end long-context story that the
seq-sharded sampler and the kernel individually enable.

    python scripts/bench_long_horizon.py                 # real chip
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_long_horizon.py --mode mesh # sharded smoke

TPU mode measures a DDIM-20 reverse chain (20 denoiser evals/chain) at
H = 256..4096 with use_pallas on/off, batch 4, bf16 — the serving shape
for long-motion synthesis. Mesh mode only demonstrates that the
seq-sharded chain compiles/executes and matches unsharded on the virtual
CPU mesh; its timings are NOT a measurement (one physical CPU).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def bench_tpu(horizons, batch, ddim_steps, depth, dim):
    import jax
    import jax.numpy as jnp
    from deepmimic_diffusion_mujoco_tpu.diffusion import sampling, schedules
    from deepmimic_diffusion_mujoco_tpu.models.local_attention import (
        LocalTransformer,
    )

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    sched = schedules.make_schedule("cosine", 1000, convention="diffuser")
    D = 69
    results = {}
    params = None
    for use_pallas in (True, False):
        m = LocalTransformer(
            input_dim=D, max_seq_len=max(horizons), dim=dim, depth=depth,
            heads=8, dim_head=64, window_size=16, num_residual_streams=4,
            use_pallas=use_pallas, dtype=dtype,
        )
        if params is None:
            # init on the host CPU with the pallas flag OFF (the kernel
            # can't lower for a CPU-placed init while the default backend
            # is the TPU); the parameter tree is identical either way
            m_init = m.clone(use_pallas=False)
            with jax.default_device(jax.devices("cpu")[0]):
                params = m_init.init(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 64, D)), jnp.zeros((1,)))
            params = jax.device_put(params, jax.devices()[0])
        for H in horizons:
            fn = jax.jit(lambda rng, H=H, m=m: sampling.sample_loop(
                sched, lambda x, t, y: m.apply(params, x, t),
                (batch, H, D), rng, mode="ddim", predict_epsilon=True,
                ddim_steps=ddim_steps).trajectories)
            out = fn(jax.random.PRNGKey(0))
            jax.block_until_ready(out)
            times = []
            for r in range(5):
                t0 = time.perf_counter()
                out = fn(jax.random.PRNGKey(r + 1))
                jax.block_until_ready(out)
                dt = time.perf_counter() - t0
                if dt > 2e-3:
                    times.append(dt)
            med = sorted(times)[len(times) // 2]
            key = f"H{H}_{'pallas' if use_pallas else 'xla'}"
            results[key] = {
                "chain_ms": round(med * 1e3, 2),
                "samples_per_s": round(batch / med, 2),
                "evals_per_s": round(batch * ddim_steps / med, 1),
            }
            print(f"[long-horizon] {key}: {results[key]}", file=sys.stderr,
                  flush=True)
    for H in horizons:
        p = results[f"H{H}_pallas"]["samples_per_s"]
        x = results[f"H{H}_xla"]["samples_per_s"]
        results[f"H{H}_speedup_pallas_over_xla"] = round(p / x, 3)
    return results


def bench_mesh(horizon, batch, ddim_steps, depth, dim):
    """Seq-sharded chain == unsharded on the virtual mesh (capability
    smoke; timings are labeled invalid)."""
    import jax
    import jax.numpy as jnp
    from deepmimic_diffusion_mujoco_tpu.diffusion import sampling, schedules
    from deepmimic_diffusion_mujoco_tpu.models.local_attention import (
        LocalTransformer,
    )
    from deepmimic_diffusion_mujoco_tpu.parallel import mesh as meshlib

    sched = schedules.make_schedule("cosine", 1000, convention="diffuser")
    D = 69
    m = LocalTransformer(
        input_dim=D, max_seq_len=horizon, dim=dim, depth=depth, heads=8,
        dim_head=64, window_size=16, num_residual_streams=4,
        use_pallas=False,
    )
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, D)),
                    jnp.zeros((1,)))
    mesh = meshlib.make_mesh(seq=len(jax.devices()))
    xsh = meshlib.seq_sharding(mesh)

    def chain(rng, sharding):
        return sampling.sample_loop(
            sched, lambda x, t, y: m.apply(params, x, t),
            (batch, horizon, D), rng, mode="ddim", predict_epsilon=True,
            ddim_steps=ddim_steps, x_sharding=sharding).trajectories

    un = jax.jit(lambda r: chain(r, None))(jax.random.PRNGKey(0))
    sh = jax.jit(lambda r: chain(r, xsh))(jax.random.PRNGKey(0))
    diff = float(jnp.abs(un - sh).max())
    ok = bool(np.isfinite(np.asarray(sh)).all()) and diff < 1e-3
    return {
        "WARNING": "virtual-CPU-mesh capability smoke, timings omitted "
                   "on purpose (one physical CPU is not a measurement)",
        "horizon": horizon,
        "seq_devices": len(jax.devices()),
        "sharded_matches_unsharded_maxdiff": diff,
        "ok": ok,
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=["tpu", "mesh"], default="tpu")
    ap.add_argument("--horizons", default="256,1024,2048,4096")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--ddim-steps", type=int, default=20)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()
    horizons = [int(h) for h in args.horizons.split(",")]
    if args.mode == "tpu":
        res = bench_tpu(horizons, args.batch, args.ddim_steps, args.depth,
                        args.dim)
    else:
        res = bench_mesh(horizons[-1], args.batch, args.ddim_steps,
                         args.depth, args.dim)
    print(json.dumps(res, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
