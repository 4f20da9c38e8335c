"""Evaluation CLI (the eval.py equivalent).

    python -m deepmimic_diffusion_mujoco_tpu.cli.evaluate --run experiments/run1 \
        --gt data/motions/humanoid3d_walk.txt [--num 50 --reps 5]

Reports sampling rate, intra/inter diversity, gt-diversity diff and SiFID
(mean +/- std over replications), the eval.py:92-142 harness.
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..data.mocap import load_clip
from ..eval import metrics as M
from ..diffusion.sampling import sample_loop
from .sample import load_run


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run", required=True)
    p.add_argument("--gt", required=True, help="ground-truth clip (.txt) or .npy")
    p.add_argument("--num", type=int, default=50)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--frames", type=int, default=None)
    p.add_argument("--ema", action="store_true")
    p.add_argument("--json", dest="json_out", default=None)
    p.add_argument(
        "--fid", action="store_true",
        help="also compute motion-FID of generated samples vs the real "
             "dataset (the calculate_motion_fid.py workflow, fixed: the "
             "reference version crashes on mismatched kwargs, "
             "SURVEY.md section 2.6)",
    )
    p.add_argument(
        "--physics", action="store_true",
        help="also PD-track generated samples on the forward-dynamics "
             "engine and report tracking reward / survival (physical "
             "plausibility; the ground truth's own score prints alongside "
             "as the reference point)",
    )
    p.add_argument("--physics-horizon", type=int, default=15)
    p.add_argument(
        "--rmse", action="store_true",
        help="also generate samples clamped to the ground truth's frame 0 "
             "and report per-dim RMSE vs the clip (the BASELINE.md "
             "sample-quality number; min over samples + mean)",
    )
    p.add_argument(
        "--check", action="append", default=[], metavar="EXPR",
        help="regression assertion on the results dict, e.g. "
             "'sifid.mean<=2.2' or 'rmse.min<=0.02'; repeatable; any "
             "failing check prints FAIL and exits nonzero (the BASELINE "
             "regression gate, VERDICT round-1 item 6)",
    )
    args = p.parse_args(argv)

    cfg, model, sched, state, meta = load_run(args.run)
    params = state.ema_params if args.ema else state.params
    d = cfg.diffusion
    D = cfg.model.input_dim

    if args.gt.endswith(".txt"):
        clip = load_clip(args.gt)
        gt = clip.combined() if D == 69 else clip.qpos
    else:
        gt = np.load(args.gt)
    H = args.frames or min(gt.shape[0], cfg.model.max_seq_len)
    gt = jnp.asarray(gt[:H, :D], jnp.float32)

    seed = [0]

    def sample_fn(n):
        seed[0] += 1
        return sample_loop(
            sched, lambda x, t, y: model.apply(params, x, t, y),
            (n, H, D), jax.random.PRNGKey(seed[0]),
            mode=d.mode, predict_epsilon=not d.predict_x0,
            clip_denoised=d.clip_denoised,
        ).trajectories

    results = M.evaluate(sample_fn, gt, num_samples=args.num,
                         replications=args.reps)
    if args.fid:
        from ..data.datasets import MotionDataset
        from ..diffusion.conditioning import clamp_frame0

        ds = MotionDataset.from_path(
            args.gt, include_velocity=(D == 69), augment="cyclic_rooted",
        )
        real = jnp.asarray(ds.trajectories[:, :H, :D])
        n = min(args.num, int(real.shape[0]))
        # the reference's generated side is conditioned on frame 0 of a
        # randomly drawn REAL sample (fid_score.py:110-117: cond from
        # real_dataset[randint], model.sample(cond=...)); mirror that here —
        # per-sample random draws rather than per-batch, same quantity
        idx = np.random.default_rng(0).integers(0, real.shape[0], size=n)
        seed[0] += 1
        gen = sample_loop(
            sched, lambda x, t, y: model.apply(params, x, t, y),
            (n, H, D), jax.random.PRNGKey(seed[0]),
            mode=d.mode, predict_epsilon=not d.predict_x0,
            clip_denoised=d.clip_denoised,
            conditioning_fn=clamp_frame0(real[idx, 0]),
        ).trajectories
        results["motion_fid"] = {"mean": M.motion_fid(real, gen), "std": 0.0}
    if args.physics:
        from ..physics.plausibility import track_motions

        # physics tracking consumes the 35-dim qpos track (69-dim models'
        # velocity tail is dropped, matching save_motions' slice contract)
        gen35 = np.asarray(sample_fn(args.num))[..., :35]
        phys = track_motions(gen35, horizon=args.physics_horizon)["summary"]
        gt35 = np.asarray(gt)[None, :, :35]
        phys_gt = track_motions(gt35, horizon=args.physics_horizon)["summary"]
        results["physics_tracking"] = {
            "generated": phys,
            "ground_truth": phys_gt,
        }
    if args.rmse:
        from ..diffusion.conditioning import clamp_frame0

        seed[0] += 1
        gen = sample_loop(
            sched, lambda x, t, y: model.apply(params, x, t, y),
            (args.num, H, D), jax.random.PRNGKey(seed[0]),
            mode=d.mode, predict_epsilon=not d.predict_x0,
            clip_denoised=d.clip_denoised,
            conditioning_fn=clamp_frame0(
                jnp.broadcast_to(gt[0], (args.num,) + gt[0].shape)),
        ).trajectories
        err = jnp.sqrt(jnp.mean((gen - gt[None]) ** 2, axis=(1, 2)))
        results["rmse"] = {
            "min": float(err.min()), "mean": float(err.mean()),
            "std": float(err.std()),
        }
    text = json.dumps(results, indent=2)
    print(text)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(text)
    if args.check:
        failures = check_results(results, args.check)
        if failures:
            raise SystemExit(1)


def check_results(results: dict, exprs: list[str]) -> list[str]:
    """Evaluate 'dotted.path OP value' regression assertions against the
    results dict (OP in <=, >=, <, >). Prints one PASS/FAIL line per check
    and returns the failing expressions."""
    import operator
    import re

    ops = {"<=": operator.le, ">=": operator.ge,
           "<": operator.lt, ">": operator.gt}
    failures = []
    for expr in exprs:
        m = re.match(r"^([\w.]+)\s*(<=|>=|<|>)\s*([-+0-9.eE]+)$", expr.strip())
        if not m:
            raise ValueError(f"bad --check expression: {expr!r}")
        path, op, bound = m.group(1), m.group(2), float(m.group(3))
        node = results
        for key in path.split("."):
            node = node[key]
        ok = ops[op](float(node), bound)
        print(f"{'PASS' if ok else 'FAIL'}: {path} = {float(node):.6g} "
              f"{op} {bound:g}")
        if not ok:
            failures.append(expr)
    return failures


if __name__ == "__main__":
    main()
