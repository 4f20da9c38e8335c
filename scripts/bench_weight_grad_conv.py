"""Decision-grade measurement of the Pallas conv weight-grad kernel at the
train step's bottom-level shape (VERDICT r4 item 6): k=5, 1024 channels,
H=20, batch 64 — the ~34%-MFU item in the round-3 trace.

    python scripts/bench_weight_grad_conv.py --json benchmarks/weight_grad_conv_r5.json

Times (median of 7, forced host readback) the Pallas kernel INCLUDING its
time-major layout transposes vs the XLA conv-filter-gradient vjp — both
jitted, bf16 operands, f32 accumulation/output. Parity is asserted before
any timing. The outcome (win or lose) goes to BASELINE as evidence.
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


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--shapes", default="64x20x1024x1024,64x40x512x512")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deepmimic_diffusion_mujoco_tpu.ops.pallas import conv_weight_grad as cw

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        cw.INTERPRET = True
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    results = {"device": str(jax.devices()[0]), "k": args.k}
    for shape_s in args.shapes.split(","):
        B, H, Cin, Cout = (int(v) for v in shape_s.split("x"))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(B, H, Cin)), dtype)
        dy = jnp.asarray(rng.normal(size=(B, H, Cout)), dtype)

        pallas_fn = jax.jit(lambda x, dy: cw.conv1d_weight_grad(x, dy, args.k))
        xla_fn = jax.jit(lambda x, dy: cw.conv1d_weight_grad_xla(x, dy, args.k))

        a = np.asarray(pallas_fn(x, dy))
        b = np.asarray(xla_fn(x, dy))
        # bf16 operands, f32 accum on both sides: agree to bf16 resolution
        err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
        assert err < 2e-2, f"parity failure rel={err}"

        flop = 2.0 * args.k * B * H * Cin * Cout
        entry = {"rel_err": float(err), "gflop": round(flop / 1e9, 2)}
        # a ~200 us op: per-call host dispatch through the tunnel is ~650 us
        # and dominates back-to-back python calls (the first round-5 capture
        # measured identical "times" for both impls = pure dispatch). Chain
        # ITERS iterations on-device in ONE program: scan over ITERS
        # perturbed inputs (distinct operands defeat CSE), accumulate a
        # scalar from each result, sync once with a scalar readback.
        ITERS = 20
        xs = jnp.stack([x + jnp.bfloat16(1e-3 * i) for i in range(ITERS)]) \
            .astype(dtype)

        def repeat(fn):
            @jax.jit
            def run(xs, dy):
                def body(acc, xi):
                    return acc + fn(xi, dy)[0, 0, 0], None
                acc, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
                return acc
            return run

        for name, fn in (("pallas", pallas_fn), ("xla", xla_fn)):
            run = repeat(
                (lambda x_, d_: cw.conv1d_weight_grad(x_, d_, args.k))
                if name == "pallas"
                else (lambda x_, d_: cw.conv1d_weight_grad_xla(x_, d_, args.k))
            )
            float(run(xs, dy))  # compile + warm
            times = []
            for r in range(7):
                t0 = time.perf_counter()
                float(run(xs, dy))  # scalar readback = the sync of record
                dt = (time.perf_counter() - t0) / ITERS
                if dt > 1e-6:
                    times.append(dt)
            med = sorted(times)[len(times) // 2]
            entry[f"{name}_us"] = round(med * 1e6, 1)
            entry[f"{name}_tflops"] = round(flop / med / 1e12, 1)
        entry["speedup_pallas_over_xla"] = round(
            entry["xla_us"] / entry["pallas_us"], 3)
        results[shape_s] = entry
        print(f"[wgrad] {shape_s}: {entry}", file=sys.stderr, flush=True)
    print(json.dumps(results, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
