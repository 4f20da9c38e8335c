"""Playback CLI (the mocap_player.py equivalent).

    python -m deepmimic_diffusion_mujoco_tpu.cli.play motion1.npy [--loops 3]
        [--video out.avi] [--no-render]

Plays a saved (T, 35) qpos motion through MuJoCo kinematics with the
root-xy phase carry (mocap_player.py:86-91). Also accepts raw DeepMimic
clip .txt files (plays the parsed qpos track).
"""
from __future__ import annotations

import argparse



def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("motion", help=".npy motion or DeepMimic .txt clip")
    p.add_argument("--loops", type=int, default=1)
    p.add_argument("--video", default=None)
    p.add_argument("--no-render", action="store_true")
    args = p.parse_args(argv)

    from ..physics.player import MocapPlayer, play_mocap_np_file

    if args.motion.endswith(".txt"):
        from ..data.mocap import load_clip

        clip = load_clip(args.motion)
        frames = MocapPlayer().play(
            clip.qpos, loops=args.loops, render=not args.no_render,
            video_path=args.video,
        )
    else:
        frames = play_mocap_np_file(
            args.motion, loops=args.loops, render=not args.no_render,
            video_path=args.video,
        )
    print(f"played; {len(frames)} frames rendered")


if __name__ == "__main__":
    main()
