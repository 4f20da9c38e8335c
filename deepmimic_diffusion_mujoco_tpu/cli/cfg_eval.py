"""Per-class, per-CFG-scale quantitative evaluation of a class-conditional
checkpoint (VERDICT round-3 weak #5: round 3 SAMPLED the CFG sweep but
never SCORED it; the reference eyeballed its CFG comparisons,
transformer_inference.py:550-605).

    python -m deepmimic_diffusion_mujoco_tpu.cli.cfg_eval \
        --run experiments/allclips12k_r4 --scales 0,1.5,3,5 --num 8 \
        --out experiments/allclips12k_r4/cfg_eval.json

For every (class, cfg_scale) pair: sample `num` motions conditioned on the
class label (CFG lerp vs the null label, one 2B-batch forward per step),
then score

- sifid_own     — SiFID vs the class's OWN ground-truth clip (eval.py:60-77
                  semantics; lower = closer to that motion family),
- sifid_best    — the class whose clip gives the LOWEST SiFID; equal to the
                  conditioned class when conditioning discriminates,
- rmse_min      — best frame0-conditioned per-dim trajectory RMSE vs the
                  own clip over the batch,
- intra_div     — intra-diversity (window-pair L2) of the batch.

The summary reports per-scale class-accuracy (fraction of classes whose
sifid_best == own class): the quantitative version of the reference's
"did the sample look like the right motion" check.
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.mocap import load_clip
from ..data.skeleton import MOTION_CLASSES, NUM_MOTION_CLASSES
from ..diffusion.conditioning import clamp_frame0
from ..diffusion.sampling import sample_loop
from ..eval import metrics as M
from .sample import load_run


def _tile_looping(x: np.ndarray, min_frames: int) -> np.ndarray:
    """Cyclically extend a LOOPING clip to >= min_frames with the player's
    root-xy phase carry (mocap_player.py:76-79: offset += net root
    displacement per cycle, z zeroed) so tiling introduces no root
    teleport. Every DeepMimic clip here is "Loop": "wrap", so the tiled
    motion is exactly what kinematic playback shows."""
    T = x.shape[0]
    if T >= min_frames:
        return x
    reps = -(-min_frames // T)
    delta = np.zeros((x.shape[1],), x.dtype)
    delta[:2] = x[-1, :2] - x[0, :2]
    return np.concatenate([x + k * delta for k in range(reps)])[:min_frames]


def _class_clips(data_dir: str, D: int, min_frames: int = 0):
    """class id -> (name, (T, D) ground-truth array).

    min_frames > 0 tiles short LOOPING clips up to that length. Round-5
    measurement: the 25-frame run clip yields only TWO (10,10) SiFID
    windows, so its ground-truth covariance is rank-deficient garbage —
    even PERFECT run samples (cyclic tilings of the run clip itself)
    scored sifid-closer to WALK than to run, capping class accuracy at
    7/9 for any model. Tiling the looping ground truth to the evaluation
    horizon gives every class an equally-windowed reference."""
    out = {}
    for name, cid in MOTION_CLASSES.items():
        path = os.path.join(data_dir, f"{name}.txt")
        if not os.path.exists(path):
            continue
        clip = load_clip(path)
        arr = np.asarray(clip.combined() if D == 69 else clip.qpos)
        if min_frames:
            arr = _tile_looping(arr, min_frames)
        out[cid] = (name.replace("humanoid3d_", ""), arr)
    return out


def evaluate_cfg(run_dir, scales, num=8, frames=None, ema=True,
                 data_dir="data/motions", seed=0, save_motions_to=None):
    cfg, model, sched, state, meta = load_run(run_dir)
    params = state.ema_params if ema else state.params
    d = cfg.diffusion
    D = cfg.model.input_dim
    n_classes = cfg.model.num_classes or NUM_MOTION_CLASSES

    report = {"run": run_dir, "num": num, "ema": ema, "scales": {}}
    rngs = np.random.default_rng(seed)
    # ONE sampling horizon for every (class, scale) pair so the reverse
    # chain compiles once, not 9x per scale (per-class clip lengths only
    # truncate the comparisons below)
    H = frames or min(64, cfg.model.max_seq_len)
    report["frames"] = H
    gt_min = max(H, 120)
    report["gt_tiled_to"] = gt_min  # see _class_clips: equal-window refs
    clips = _class_clips(data_dir, D, min_frames=gt_min)

    # Hoist the two reverse chains as jitted functions defined ONCE:
    # model_fn / conditioning_fn are STATIC jit args of sample_loop keyed
    # by closure identity, so building fresh lambdas per (class, scale)
    # call recompiled the full CFG chain ~90x through the tunnel (the
    # round-5 cfg_eval "hang" — it was compiling for an hour). cfg_scale
    # and the clamp frame are traced arguments here, so every (class,
    # scale) pair reuses the same two executables.
    def model_fn(x, t, yy):
        return model.apply(params, x, t, yy)

    common = dict(mode=d.mode, predict_epsilon=not d.predict_x0,
                  clip_denoised=d.clip_denoised)

    @jax.jit
    def chain_plain(key, y, uy, scale):
        return sample_loop(
            sched, model_fn, (num, H, D), key,
            y=y, cfg_scale=scale, uncond_y=uy, **common,
        ).trajectories

    @jax.jit
    def chain_frame0(key, y, uy, scale, frame0):
        return sample_loop(
            sched, model_fn, (num, H, D), key,
            y=y, cfg_scale=scale, uncond_y=uy,
            conditioning_fn=clamp_frame0(
                jnp.broadcast_to(frame0, (num,) + frame0.shape)),
            **common,
        ).trajectories
    import sys as _sys
    import time as _time

    for s in scales:
        per_class = {}
        for cid, (cname, gt_full) in sorted(clips.items()):
            print(f"[cfg_eval] scale {s} class {cname} "
                  f"({_time.strftime('%H:%M:%S')})",
                  file=_sys.stderr, flush=True)
            L = min(H, gt_full.shape[0])
            gt = jnp.asarray(gt_full[:L, :D], jnp.float32)
            key = jax.random.PRNGKey(int(rngs.integers(1 << 30)))
            y = jnp.full((num,), cid, jnp.int32)
            uy = jnp.full((num,), n_classes, jnp.int32)
            scale = jnp.float32(s)
            # scale 0 == pure unconditional (the reference lerp convention,
            # diffusion_v4.py:109: lerp(uncond, cond, scale))
            gen = chain_plain(key, y, uy, scale)
            # frame0-conditioned second batch for trajectory RMSE (the
            # evaluate CLI's --rmse contract)
            gen0 = chain_frame0(jax.random.fold_in(key, 1), y, uy, scale,
                                gt[0])
            sifid_by_class = {}
            for cid2, (cname2, gt2_full) in sorted(clips.items()):
                gt2 = jnp.asarray(gt2_full[:, :D], jnp.float32)
                # windows need >= window_size frames of both
                if gt2.shape[0] < 10 or H < 10:
                    continue
                # gt_step_size=1: densely-windowed reference (with the
                # tiled gt above, this is what makes short-clip classes
                # winnable at all — see _class_clips)
                sifid_by_class[cname2] = float(
                    M.sifid(gen, gt2, gt_step_size=1))
            if not sifid_by_class:
                # every clip (or the sampling horizon) shorter than the
                # SiFID window: no comparison is possible for this class
                continue
            finite = {k: v for k, v in sifid_by_class.items()
                      if np.isfinite(v)}
            # degenerate all-non-finite fallback still mins by VALUE (an
            # alphabetical min over class names silently faked a winner)
            best = min(finite or sifid_by_class, key=sifid_by_class.get)
            err = jnp.sqrt(jnp.mean((gen0[:, :L] - gt[None]) ** 2,
                                    axis=(1, 2)))
            per_class[cname] = {
                "sifid_own": sifid_by_class.get(cname),
                "sifid_best": best,
                "sifid_best_value": sifid_by_class[best],
                "rmse_min": float(err.min()),
                "rmse_mean": float(err.mean()),
                "intra_div": float(M.intra_diversity(
                    gen, jax.random.PRNGKey(0))),
            }
            if save_motions_to:
                mdir = os.path.join(save_motions_to, f"cfg_{s}", cname)
                from .sample import save_motions

                save_motions(np.asarray(gen), mdir)
        n_right = sum(
            1 for c, r in per_class.items() if r["sifid_best"] == c)
        # sifid_own is None when a class's own clip was too short to window
        own = [r["sifid_own"] for r in per_class.values()
               if r["sifid_own"] is not None]
        report["scales"][str(s)] = {
            "per_class": per_class,
            "class_accuracy": n_right / max(len(per_class), 1),
            "mean_sifid_own": float(np.nanmean(own)) if own else None,
            "mean_rmse_min": float(np.nanmean(
                [r["rmse_min"] for r in per_class.values()])),
        }
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run", required=True)
    p.add_argument("--scales", default="0,1.5,3,5")
    p.add_argument("--num", type=int, default=8)
    p.add_argument("--frames", type=int, default=None)
    p.add_argument("--no-ema", action="store_true")
    p.add_argument("--data-dir", default="data/motions")
    p.add_argument("--out", default=None)
    p.add_argument("--save-motions", default=None,
                   help="also dump the sampled motions under this dir")
    p.add_argument("--check-accuracy", default=None,
                   help="gate 'SCALE:MIN' (e.g. '3.0:0.8'): exit 1 unless "
                        "class_accuracy at that scale >= MIN — the "
                        "machine-checked CFG quality gate "
                        "(scripts/regression_gate.sh)")
    args = p.parse_args(argv)
    scales = [float(s) for s in args.scales.split(",")]
    report = evaluate_cfg(
        args.run, scales, num=args.num, frames=args.frames,
        ema=not args.no_ema, data_dir=args.data_dir,
        save_motions_to=args.save_motions,
    )
    print(f"{'scale':>6} {'class_acc':>10} {'mean_sifid':>11} {'mean_rmse':>10}")
    for s, r in report["scales"].items():
        own = r["mean_sifid_own"]
        own_s = "-" if own is None else f"{own:.3f}"
        print(f"{s:>6} {r['class_accuracy']:>10.2f} "
              f"{own_s:>11} {r['mean_rmse_min']:>10.3f}")
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    if args.check_accuracy:
        import sys

        scale_s, _, min_s = args.check_accuracy.partition(":")
        key = str(float(scale_s))
        if key not in report["scales"]:
            print(f"FAIL: scale {key} not evaluated", file=sys.stderr)
            sys.exit(1)
        acc = report["scales"][key]["class_accuracy"]
        if acc < float(min_s):
            print(f"FAIL: class_accuracy {acc:.2f} @ scale {key} < {min_s}",
                  file=sys.stderr)
            sys.exit(1)
        print(f"PASS: class_accuracy {acc:.2f} @ scale {key} >= {min_s}")
    return report


if __name__ == "__main__":
    main()
