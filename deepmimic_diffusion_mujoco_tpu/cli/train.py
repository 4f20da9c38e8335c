"""Training CLI (the train_transformer.py equivalent).

    python -m deepmimic_diffusion_mujoco_tpu.cli.train \
        --config cfg.json --data data/motions --steps 5000 --out experiments/run1

Replaces the reference CLI (train_transformer.py:450-530): one JSON config
instead of four default-dict blocks; every run directory gets config.json,
metadata-rich checkpoints, and training_metrics.json.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os

import jax
import jax.numpy as jnp

from .. import factory
from ..data.datasets import MotionDataset
from ..diffusion import process
from ..parallel import mesh as meshlib
from ..train.checkpoint import Checkpointer
from ..train.config import ExperimentConfig
from ..train.loop import Trainer, TrainerConfig, make_loss_fn
from ..train.state import EMAConfig, TrainState, make_optimizer


def build_trainer(
    cfg: ExperimentConfig, out_dir: str | None = None, resume: bool = False
) -> Trainer:
    """`resume=True` restores the latest checkpoint from out_dir (the
    reference's manual get_latest_epoch resume, serialization.py:21-27,
    here first-class elastic recovery)."""
    model, sched = factory.build_experiment(cfg)
    ds = MotionDataset.from_path(
        cfg.data.path,
        include_velocity=cfg.data.include_velocity,
        augment=cfg.data.augment,
        replicas=cfg.data.replicas,
        horizon_multiple=cfg.data.horizon_multiple,
        max_files=cfg.data.max_files,
    )
    if cfg.model.architecture != "temporal":
        # position-embedding models can't see past max_seq_len: clamp the
        # DATA horizon too, or batches longer than the trained pos table
        # would crash the first step (found by a tiny verify config)
        ds = ds.truncated(cfg.model.max_seq_len)
        H = min(ds.horizon, cfg.model.max_seq_len)
    else:
        H = ds.horizon

    x = jnp.zeros((2, H, cfg.model.input_dim))
    params = model.init(jax.random.PRNGKey(cfg.train.seed), x, jnp.zeros((2,)))

    tx = make_optimizer(
        cfg.train.optimizer_type, lr=cfg.train.lr,
        weight_decay=cfg.train.weight_decay, betas=tuple(cfg.train.betas),
        schedule=cfg.train.scheduler_type,
        num_train_steps=cfg.train.num_train_steps,
    )
    if cfg.train.gradient_accumulate_every > 1:
        import optax

        tx = optax.MultiSteps(tx, cfg.train.gradient_accumulate_every)
    state = TrainState.create(
        params, tx,
        EMAConfig(cfg.train.ema_decay, cfg.train.ema_start, cfg.train.ema_every),
    )

    weights = None
    if cfg.diffusion.loss == "diffuser":
        weights = process.diffuser_loss_weights(
            H, cfg.model.input_dim, cfg.diffusion.action_weight,
            cfg.diffusion.loss_discount,
        )
    # dropout is live in training for the architectures that define it
    # (the reference's torch modules train in train() mode by default)
    has_dropout = (
        cfg.model.architecture == "transformer" and cfg.model.dropout > 0
    ) or (
        cfg.model.architecture == "local_attention"
        and (cfg.model.attn_dropout > 0 or cfg.model.ff_dropout > 0)
    )
    loss_fn = make_loss_fn(
        sched, model.apply, kind=cfg.diffusion.loss,
        predict_epsilon=not cfg.diffusion.predict_x0,
        weights=weights, loss_kind=cfg.diffusion.loss_kind,
        label_drop_prob=cfg.train.label_drop_prob,
        null_label=cfg.model.num_classes if cfg.model.num_classes else None,
        smooth_loss_weight=cfg.diffusion.smooth_loss_weight,
        use_mask=cfg.diffusion.loss in ("v4", "x0"),
        dropout=has_dropout,
    )

    ckpt = None
    if out_dir:
        meta = dataclasses.asdict(cfg)
        ckpt = Checkpointer(os.path.join(out_dir, "checkpoints"), metadata=meta)
        if resume and ckpt.latest_step() is not None:
            state, _ = ckpt.restore(state)
            print(f"resumed from step {int(state.step)}")

    sampler_state = None
    if cfg.train.timestep_sampler == "loss_aware":
        if cfg.diffusion.loss != "v4":
            raise ValueError("timestep_sampler=loss_aware requires diffusion.loss=v4")
        from ..diffusion.timestep_sampling import LossSecondMomentState

        sampler_state = LossSecondMomentState.create(cfg.diffusion.noise_steps)

    # data-parallel only when the batch divides the device count; otherwise
    # run single-device (tiny debug configs)
    n_dev = jax.device_count()
    use_mesh = n_dev > 1 and cfg.train.batch_size % n_dev == 0
    mesh = meshlib.make_mesh() if use_mesh else None
    shard_fn = (lambda b: meshlib.shard_batch(mesh, b)) if mesh else None
    return Trainer(
        state, tx, loss_fn, ds,
        TrainerConfig(
            num_train_steps=cfg.train.num_train_steps,
            batch_size=cfg.train.batch_size,
            gradient_accumulate_every=cfg.train.gradient_accumulate_every,
            log_every=cfg.train.log_every,
            save_every=cfg.train.save_every,
            seed=cfg.train.seed,
            scan_chunk=cfg.train.scan_chunk,
            class_balanced=cfg.train.class_balanced,
        ),
        shard_fn=shard_fn,
        checkpointer=ckpt,
        wrap_accum=False,  # tx already wrapped above (resume-compatible)
        sampler_state=sampler_state,
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", help="ExperimentConfig JSON")
    p.add_argument("--data", help="clip file or directory override")
    p.add_argument("--architecture", help="model override")
    p.add_argument("--steps", type=int)
    p.add_argument("--batch-size", type=int)
    p.add_argument("--out", default="experiments/run")
    p.add_argument("--resume", action="store_true",
                   help="continue from the latest checkpoint in --out")
    p.add_argument("--set", nargs="*", default=[],
                   help="dotted overrides, e.g. model.latent_dim=256")
    args = p.parse_args(argv)

    cfg = ExperimentConfig.load(args.config) if args.config else ExperimentConfig()
    if args.data:
        cfg = cfg.override({"data.path": args.data})
    if args.architecture:
        cfg = cfg.override({"model.architecture": args.architecture})
    if args.steps:
        cfg = cfg.override({"train.num_train_steps": args.steps})
    if args.batch_size:
        cfg = cfg.override({"train.batch_size": args.batch_size})
    for ov in args.set:
        key, _, val = ov.partition("=")
        try:
            parsed = json.loads(val)
        except json.JSONDecodeError:
            parsed = val  # bare string, e.g. data.augment=replicate
        cfg = cfg.override({key: parsed})

    os.makedirs(args.out, exist_ok=True)
    cfg.save(os.path.join(args.out, "config.json"))
    trainer = build_trainer(cfg, args.out, resume=args.resume)
    trainer.train()
    trainer.save_metrics(os.path.join(args.out, "training_metrics.json"))
    print(f"done: best loss {trainer.best_loss:.6f} @ step {trainer.best_step}")


if __name__ == "__main__":
    main()
