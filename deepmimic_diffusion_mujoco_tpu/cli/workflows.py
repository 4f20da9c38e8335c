"""The reference's seven constrained-sampling workflows as one CLI.

Each subcommand reproduces an archive notebook's behavior (SURVEY.md
section 2.4) through the library conditioners:

    editing            archive/1_motion_editing_v2.ipynb      (hold-a-box)
    start-with-motion  archive/2_start_with_motion_v2.ipynb   (motion->motion)
    short-projection   archive/3_short_projection_v2.ipynb    (0.75x horizon)
    long-projection    archive/3_5_long_projection_v2.ipynb   (3x + keyframes)
    inbetween          archive/4_motion_inbetweening_v2.ipynb
    blend              archive/5_motion_blending_v2.ipynb     (walk->backflip)
    steer              archive/6_walking_trajectory_v2.ipynb  (root path)

    python -m deepmimic_diffusion_mujoco_tpu.cli.workflows editing \
        --run experiments/run1 --clip data/motions/humanoid3d_walk.txt \
        --out out/ [--untrained]

--untrained swaps in a freshly-initialized model (smoke mode: exercises the
conditioning mechanics without a checkpoint, like the notebooks' pre-training
sanity cells).
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import factory
from ..data.mocap import load_clip
from ..diffusion import conditioning as C
from ..diffusion.sampling import sample_loop
from ..train.config import ExperimentConfig
from .sample import load_run, save_motions


def _setup(args):
    if args.untrained:
        cfg = ExperimentConfig()
        cfg.model.architecture = "temporal"
        cfg.model.input_dim = 35
        cfg.model.channel_dim = args.dim
        cfg.diffusion.noise_steps = args.steps
        cfg.diffusion.predict_x0 = False
        cfg.diffusion.mode = "posterior"
        cfg.diffusion.loss = "diffuser"
        model, sched = factory.build_experiment(cfg)
        clip = load_clip(args.clip)
        H = clip.qpos.shape[0] - clip.qpos.shape[0] % 8
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, 35)), jnp.zeros((1,))
        )
    else:
        cfg, model, sched, state, _ = load_run(args.run)
        params = state.ema_params if args.ema else state.params
    d = cfg.diffusion

    def model_fn(x, t, y):
        return model.apply(params, x, t, y)

    def sample(shape, rng, **kw):
        return sample_loop(
            sched, model_fn, shape, rng, mode=d.mode,
            predict_epsilon=not d.predict_x0,
            clip_denoised=d.clip_denoised, **kw,
        ).trajectories

    return cfg, sample


def _clip_qpos(path, multiple=8):
    q = load_clip(path).qpos.astype(np.float32)
    return q[: len(q) - len(q) % multiple]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("workflow", choices=[
        "editing", "start-with-motion", "short-projection",
        "long-projection", "inbetween", "blend", "steer",
    ])
    p.add_argument("--run", default=None)
    p.add_argument("--untrained", action="store_true")
    p.add_argument("--ema", action="store_true")
    p.add_argument("--clip", default="data/motions/humanoid3d_walk.txt")
    p.add_argument("--clip2", default="data/motions/humanoid3d_backflip.txt")
    p.add_argument("--num", type=int, default=2)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--dim", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="out")
    args = p.parse_args(argv)

    cfg, sample = _setup(args)
    D = 35 if args.untrained else cfg.model.input_dim
    rng = jax.random.PRNGKey(args.seed)
    motion = _clip_qpos(args.clip)
    H = motion.shape[0]
    wf = args.workflow

    if wf == "editing":
        out = sample((args.num, H, D), rng, conditioning_fn=C.holding_box(D))
    elif wf == "start-with-motion":
        # shallow noising of a real motion, 2 denoise steps
        # (archive/2_start_with_motion_v2.ipynb cells 21-22)
        start = jnp.asarray(np.pad(motion, ((0, 0), (0, D - 35)))[None])
        out = sample((args.num, H, D), rng,
                     starting_motion=start, t_start=2)
    elif wf == "short-projection":
        h = int(H * 0.75) // 8 * 8
        out = sample((args.num, h, D), rng)
    elif wf == "long-projection":
        h = H * 3
        tiled = np.tile(motion, (3, 1))
        tiled = np.pad(tiled, ((0, 0), (0, D - 35)))
        # keyframe checkpoints: clamp +/-2 frames around each clip seam,
        # dims 3: onward (free root xy, 3_5_long_projection_v2.ipynb)
        keyframes = []
        for kf in (0, H, 2 * H):
            keyframes.extend(range(max(kf - 2, 0), min(kf + 3, h)))
        cond = C.clamp_frames(tiled, keyframes, dims=slice(3, 35), horizon=h)
        out = sample((args.num, h, D), rng, conditioning_fn=cond)
    elif wf == "inbetween":
        edge = H // 4
        ref = np.pad(motion, ((0, 0), (0, D - 35)))
        cond = C.inbetween(ref, ref, horizon=H, edge=edge)
        out = sample((args.num, H, D), rng, conditioning_fn=cond)
    elif wf == "blend":
        second = _clip_qpos(args.clip2)
        a = np.pad(motion, ((0, 0), (0, D - 35)))
        b = np.pad(second, ((0, 0), (0, D - 35)))
        # trim the first clip's tail so the combined horizon is U-Net-valid
        a = a[: a.shape[0] - (a.shape[0] + b.shape[0]) % 8]
        start_motion, cond = C.blend(a, b, seam_halfwidth=5,
                                     free_dims_second=slice(3, 35))
        out = sample((args.num, start_motion.shape[0], D), rng,
                     starting_motion=jnp.asarray(start_motion[None]),
                     t_start=2, conditioning_fn=cond)
    elif wf == "steer":
        path = np.stack([np.linspace(0, 2.0, 16), np.zeros(16)], axis=1)
        cond = C.steer_root(path, horizon=H, feature_dim=D)
        out = sample((args.num, H, D), rng, conditioning_fn=cond)

    paths = save_motions(np.asarray(out), args.out, prefix=f"{wf}_")
    print("\n".join(paths))


if __name__ == "__main__":
    main()
