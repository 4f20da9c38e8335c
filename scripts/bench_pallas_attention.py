"""End-to-end Pallas-vs-XLA measurement for the round-2 fused attention
kernel (VERDICT r1 item 5: win at a production shape or write the roofline
verdict).

Methodology: the tunneled chip adds ~5-30 ms of per-call dispatch latency,
so single-dispatch timings are meaningless at these op sizes. Every
measurement here scans R iterations of the workload INSIDE one jitted
program (carrying the output back as input) and divides by R, so dispatch
is amortized to noise.

Times the FULL LocalTransformer forward (the denoise-step workload) with
use_pallas False/True at production shapes (dim 512, heads 8, depth 6),
plus the isolated attention stage. Run on the TPU chip:

    timeout 1500 python scripts/bench_pallas_attention.py
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

R = 20  # in-program repetitions per dispatch


def timed_scan(jax, jnp, body, x0, reps=4):
    """best time of scan(body, R) / R; body: x -> x (same shape/dtype)."""
    def many(x):
        def step(c, _):
            return body(c), None

        y, _ = jax.lax.scan(step, x, None, length=R)
        return y

    f = jax.jit(many)
    out = f(x0)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(x0)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / R


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepmimic_diffusion_mujoco_tpu.models.local_attention import (
        LocalTransformer,
    )
    from deepmimic_diffusion_mujoco_tpu.ops.pallas import fused_local_attention as FK

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    shapes = [
        # (B, H, window) at the live config dim 512 / heads 8 / depth 6
        (16, 128, 16),
        (16, 256, 16),
        (16, 512, 64),
        (4, 1024, 64),
    ]
    print(f"{'B':>4} {'H':>6} {'w':>4} {'xla_ms':>9} {'pallas_ms':>10} "
          f"{'speedup':>8}", flush=True)
    for B, H, w in shapes:
        models = {
            flag: LocalTransformer(
                input_dim=35, max_seq_len=max(H, 128), dim=512, depth=6,
                heads=8, dim_head=64, window_size=w, use_pallas=flag,
                dtype=dtype,
            ) for flag in (False, True)
        }
        with jax.default_device(cpu):
            x = jnp.asarray(
                np.random.default_rng(0).normal(size=(B, H, 35)), jnp.float32)
            t = jnp.zeros((B,))
            params = models[False].init(jax.random.PRNGKey(0), x, t)
        params = jax.device_put(params, dev)
        x = jax.device_put(x, dev)
        t = jax.device_put(t, dev)

        times = {}
        for flag in (False, True):
            m = models[flag]
            # model maps (B,H,35)->(B,H,35): chain it directly
            times[flag] = timed_scan(
                jax, jnp, lambda xx, m=m: m.apply(params, xx, t), x)
        print(f"{B:>4} {H:>6} {w:>4} {times[False]*1e3:>9.3f} "
              f"{times[True]*1e3:>10.3f} {times[False]/times[True]:>8.2f}x",
              flush=True)

    # isolated attention stage: qkv (B,N,3hd) -> context (B,N,hd); pad the
    # context back up to qkv width so the scan carry keeps one shape
    print("\nisolated attention stage (qkv -> context):", flush=True)
    h, dh = 8, 64
    for B, H, w in shapes:
        qkv0 = jax.device_put(jnp.asarray(
            np.random.default_rng(1).normal(size=(B, H, 3 * h * dh)),
            dtype), dev)

        def chain(attn_fn):
            def body(qkv):
                ctx = attn_fn(qkv)
                return jnp.concatenate([ctx, ctx, ctx], axis=-1)

            return body

        t_x = timed_scan(jax, jnp, chain(
            lambda q: FK._jnp_reference(q, h, dh, w, False, True, True)), qkv0)
        t_p = timed_scan(jax, jnp, chain(
            lambda q: FK.fused_qkv_local_attention(
                q, h, dh, w, False, True, True)), qkv0)
        print(f"{B:>4} {H:>6} {w:>4} {t_x*1e6:>9.1f}us {t_p*1e6:>9.1f}us "
              f"{t_x/t_p:>8.2f}x", flush=True)


if __name__ == "__main__":
    main()
