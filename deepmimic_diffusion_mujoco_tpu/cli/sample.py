"""Inference CLI (the transformer_inference.py equivalent).

    python -m deepmimic_diffusion_mujoco_tpu.cli.sample \
        --run experiments/run1 --num 4 --out samples/ [--frames 120] \
        [--cfg-scale 3.0] [--class-id 7] [--conditioner holding_box] [--ema]

Reproduces DiffusionInference (transformer_inference.py:16-284):
architecture autodetect from checkpoint metadata, CFG-scale control,
horizon override (custom_frames), and save_motions' exactly-35-qpos-dims
slicing/padding contract for MuJoCo playback.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import factory
from ..diffusion import conditioning as C
from ..diffusion.sampling import sample_loop
from ..train.checkpoint import Checkpointer
from ..train.config import ExperimentConfig
from ..train.state import TrainState, make_optimizer

CONDITIONERS = {
    "none": lambda dim: None,
    "holding_box": lambda dim: C.holding_box(dim),
}


def load_run(run_dir: str, best: bool = True):
    """Reconstruct model+schedule+params from a run directory's metadata
    (the serialization.load_diffusion analog, serialization.py:36-60)."""
    ck_dir = os.path.join(run_dir, "checkpoints")
    cfg = ExperimentConfig.load(os.path.join(run_dir, "config.json"))
    model, sched = factory.build_experiment(cfg)
    x = jnp.zeros((1, 16, cfg.model.input_dim))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    # the restore template must match the training optimizer's state tree
    tx = make_optimizer(
        cfg.train.optimizer_type, lr=cfg.train.lr,
        weight_decay=cfg.train.weight_decay, betas=tuple(cfg.train.betas),
        schedule=cfg.train.scheduler_type,
        num_train_steps=cfg.train.num_train_steps,
    )
    if cfg.train.gradient_accumulate_every > 1:
        import optax

        tx = optax.MultiSteps(tx, cfg.train.gradient_accumulate_every)
    target = TrainState.create(params, tx)
    ckpt = Checkpointer(ck_dir)
    try:
        state, meta = ckpt.restore(target, best=best)
    except FileNotFoundError:
        state, meta = ckpt.restore(target, best=False)
    return cfg, model, sched, state, meta


def save_motions(samples: np.ndarray, out_dir: str, prefix: str = "motion"):
    """Slice/pad to exactly 35 qpos dims and save .npy per sample
    (transformer_inference.py:213-276)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, s in enumerate(np.asarray(samples)):
        m = s[:, :35]
        if m.shape[1] < 35:
            m = np.pad(m, ((0, 0), (0, 35 - m.shape[1])))
        path = os.path.join(out_dir, f"{prefix}{i + 1}.npy")
        np.save(path, m)
        paths.append(path)
    return paths


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run", required=True)
    p.add_argument("--num", type=int, default=4)
    p.add_argument("--frames", type=int, default=None)
    p.add_argument("--cfg-scale", type=float, default=None)
    p.add_argument("--class-id", type=int, default=None)
    p.add_argument("--conditioner", default="none", choices=sorted(CONDITIONERS))
    p.add_argument("--ema", action="store_true", help="sample the EMA weights")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    p.add_argument(
        "--cfg-sweep", default=None,
        help="comma-separated CFG scales; per-scale subdir + metadata JSON "
             "(the reference's scale-comparison experiments, "
             "transformer_inference.py:550-605)",
    )
    args = p.parse_args(argv)

    cfg, model, sched, state, meta = load_run(args.run)
    params = state.ema_params if args.ema else state.params
    d = cfg.diffusion
    H = args.frames or cfg.model.max_seq_len
    D = cfg.model.input_dim
    n_classes = cfg.model.num_classes

    y = uncond_y = None
    cfg_scale = None
    if args.class_id is not None and n_classes:
        y = jnp.full((args.num,), args.class_id, jnp.int32)
        uncond_y = jnp.full((args.num,), n_classes, jnp.int32)
        cfg_scale = args.cfg_scale if args.cfg_scale is not None else d.cfg_scale

    cond = CONDITIONERS[args.conditioner](D)
    model_fn = lambda x, t, yy: model.apply(params, x, t, yy)
    out_dir = args.out or os.path.join(args.run, "sampled_motions")

    if args.cfg_sweep is not None:
        import json

        scales = [float(s) for s in args.cfg_sweep.split(",")]
        if y is None:
            y = jnp.zeros((args.num,), jnp.int32)
            uncond_y = jnp.full((args.num,), max(n_classes, 1), jnp.int32)
        meta = {"scales": scales, "num": args.num, "frames": H,
                "class_id": args.class_id, "run": args.run}
        all_paths = []
        for s in scales:
            out = sample_loop(
                sched, model_fn, (args.num, H, D),
                jax.random.PRNGKey(args.seed),
                mode=d.mode, predict_epsilon=not d.predict_x0,
                conditioning_fn=cond, cfg_scale=s if s > 0 else None,
                y=y, uncond_y=uncond_y, clip_denoised=d.clip_denoised,
            )
            sub = os.path.join(out_dir, f"cfg_{s:g}")
            all_paths += save_motions(np.asarray(out.trajectories), sub)
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "cfg_sweep.json"), "w") as f:
            json.dump({**meta, "files": all_paths}, f, indent=2)
        print("\n".join(all_paths))
        return

    out = sample_loop(
        sched, model_fn, (args.num, H, D), jax.random.PRNGKey(args.seed),
        mode=d.mode, predict_epsilon=not d.predict_x0,
        conditioning_fn=cond, cfg_scale=cfg_scale, y=y, uncond_y=uncond_y,
        clip_denoised=d.clip_denoised,
    )
    paths = save_motions(np.asarray(out.trajectories), out_dir)
    print("\n".join(paths))


if __name__ == "__main__":
    main()
