"""Playback CLI (the mocap_player.py equivalent).

    python -m deepmimic_diffusion_mujoco_tpu.cli.play motion1.npy [--loops 3]
        [--video out.avi] [--no-render] [--physics]

Plays a saved (T, 35) qpos motion through MuJoCo kinematics with the
root-xy phase carry (mocap_player.py:86-91). Also accepts raw DeepMimic
clip .txt files (plays the parsed qpos track).

`--physics` additionally PD-tracks the motion on the forward-dynamics
engine and reports the DeepMimic tracking reward + survival — an automatic
physical-plausibility check the reference (kinematic-only, README.md:46
"not physically accurate") could not offer.
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("motion", help=".npy motion or DeepMimic .txt clip")
    p.add_argument("--loops", type=int, default=1)
    p.add_argument("--video", default=None)
    p.add_argument("--no-render", action="store_true")
    p.add_argument("--physics", action="store_true",
                   help="PD-track the motion on the dynamics engine and "
                        "report tracking reward / survival")
    p.add_argument("--physics-horizon", type=int, default=15,
                   help="control steps scored by --physics (open-loop PD "
                        "has no balance feedback; use a fixed horizon)")
    args = p.parse_args(argv)

    from ..physics.player import MocapPlayer, play_mocap_np_file

    if args.motion.endswith(".txt"):
        from ..data.mocap import load_clip

        qpos = load_clip(args.motion).qpos
        frames = MocapPlayer().play(
            qpos, loops=args.loops, render=not args.no_render,
            video_path=args.video,
        )
    else:
        import numpy as np

        qpos = np.load(args.motion)
        frames = play_mocap_np_file(
            args.motion, loops=args.loops, render=not args.no_render,
            video_path=args.video,
        )
    print(f"played; {len(frames)} frames rendered")

    if args.physics:
        from ..physics.plausibility import track_motions

        res = track_motions(qpos, horizon=args.physics_horizon)
        s = res["summary"]
        curve = " ".join(f"{r:.2f}" for r in res["reward_curve"][:10])
        print(f"physics tracking: reward {s['physics_reward_mean']:.3f} "
              f"(auc {s['physics_reward_auc']:.3f}), survived "
              f"{s['physics_survived_frac']:.0%} of "
              f"{args.physics_horizon} steps; per-step reward: {curve} ...")


if __name__ == "__main__":
    main()
