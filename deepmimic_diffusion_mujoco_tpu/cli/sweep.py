"""Hyperparameter sweep CLI (train_transformer.py --sweep + tune_transformer
+ analyze_tuning equivalents, without the MLflow dependency).

    python -m deepmimic_diffusion_mujoco_tpu.cli.sweep --config base.json \
        --grid grid.json --out experiments/sweep1

grid.json maps dotted config keys to value lists:
    {"model.latent_dim": [128, 256], "train.lr": [1e-3, 1e-4]}

Each combination trains in its own subdirectory with config.json +
training_metrics.json; interim and final summary JSONs track the best
config (train_transformer.py:578-723, best_configs.txt contract).
"""
from __future__ import annotations

import argparse
import json
import os

from ..train.config import ExperimentConfig, expand_grid
from .train import build_trainer


def run_sweep(base: ExperimentConfig, grid: dict, out_dir: str) -> dict:
    configs = expand_grid(base, grid)
    os.makedirs(out_dir, exist_ok=True)
    results = []
    for i, cfg in enumerate(configs):
        exp_dir = os.path.join(out_dir, cfg.name)
        os.makedirs(exp_dir, exist_ok=True)
        cfg.save(os.path.join(exp_dir, "config.json"))
        print(f"[{i + 1}/{len(configs)}] {cfg.name}")
        trainer = build_trainer(cfg, exp_dir)
        trainer.train()
        trainer.save_metrics(os.path.join(exp_dir, "training_metrics.json"))
        results.append({
            "name": cfg.name,
            "dir": exp_dir,
            "best_loss": trainer.best_loss,
            "best_step": trainer.best_step,
            "final_loss": trainer.metrics[-1]["loss"] if trainer.metrics else None,
        })
        interim = sorted(results, key=lambda r: r["best_loss"])
        with open(os.path.join(out_dir, "interim_summary.json"), "w") as f:
            json.dump(interim, f, indent=2)
    final = sorted(results, key=lambda r: r["best_loss"])
    summary = {"best": final[0] if final else None, "all": final}
    with open(os.path.join(out_dir, "final_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    # best_configs.txt-style report (analyze_tuning.py:20-99)
    with open(os.path.join(out_dir, "best_configs.txt"), "w") as f:
        for r in final[:5]:
            f.write(f"{r['name']}: best_loss={r['best_loss']:.6f} "
                    f"@ step {r['best_step']}\n")
    return summary


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None, help="base ExperimentConfig JSON")
    p.add_argument("--grid", required=True, help="dotted-key grid JSON")
    p.add_argument("--out", default="experiments/sweep")
    args = p.parse_args(argv)

    base = ExperimentConfig.load(args.config) if args.config else ExperimentConfig()
    with open(args.grid) as f:
        grid = json.load(f)
    summary = run_sweep(base, grid, args.out)
    if summary["best"]:
        print(f"best: {summary['best']['name']} loss {summary['best']['best_loss']:.6f}")


if __name__ == "__main__":
    main()
