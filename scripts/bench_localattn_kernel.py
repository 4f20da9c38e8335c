"""LocalTransformer LIVE-config training throughput: fused Pallas windowed
attention ON vs OFF (VERDICT round-3 item 2 — "localattn train step
measured >= the jnp path with the kernel actually on").

The live config is the reference's local_attention CLI config
(train_transformer.py:469-482): dance_a (H=152), dim 512, depth 6, heads 8,
window 16, attn/ff dropout 0.3 ACTIVE, bs 64, adamw exponential lr 2e-4.
Round 4 extended the kernel with dropout keep-mask + key-mask + unaligned-N
support, so the kernel path is finally reachable in this config
(ops/pallas/fused_local_attention.py).

    python scripts/bench_localattn_kernel.py [--steps 300]

Reports marginal optimizer steps/s (last chunks, compile excluded) for
both flags and the ratio.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LIVE_CONFIG = os.path.join(REPO, "experiments/localattn5k_r3/config.json")


def marginal_steps_per_s(metrics):
    """Trainer metrics record cumulative (i+1)/dt; recover marginal rate
    over the final half of the records."""
    pts = [(m["step"], m["step"] / m["steps_per_s"]) for m in metrics
           if m.get("steps_per_s")]
    if len(pts) < 3:
        return metrics[-1]["steps_per_s"] if metrics else None
    (s1, t1), (s2, t2) = pts[len(pts) // 2], pts[-1]
    return (s2 - s1) / (t2 - t1)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--config", default=LIVE_CONFIG)
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()

    from deepmimic_diffusion_mujoco_tpu.cli.train import build_trainer
    from deepmimic_diffusion_mujoco_tpu.train.config import ExperimentConfig

    base = ExperimentConfig.load(args.config)
    results = {}
    for use_pallas in (True, False):
        cfg = base.override({
            "train.num_train_steps": args.steps,
            "train.log_every": 50,
            "train.scan_chunk": 50,
            "model.use_pallas": use_pallas,
        })
        trainer = build_trainer(cfg)
        trainer.train()
        rate = marginal_steps_per_s(trainer.metrics)
        key = "pallas" if use_pallas else "xla"
        results[key] = {
            "steps_per_s": round(rate, 2),
            "final_loss": trainer.metrics[-1]["loss"],
        }
        print(f"[localattn-bench] {key}: {results[key]}", file=sys.stderr,
              flush=True)
    results["pallas_over_xla"] = round(
        results["pallas"]["steps_per_s"] / results["xla"]["steps_per_s"], 3)
    print(json.dumps(results, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
