"""End-to-end demo: train on the walk clip, sample the diffusion model,
play the sampled motion through the MuJoCo-parity player, and write a
video artifact.

Scripted reproduction of the reference's notebook workflow
(archive/0_temporal_unet_diffusion_v2.ipynb: train -> sample -> save 35-dim
motion -> mocap_player playback -> VideoSaver), one command:

    python examples/end_to_end_walk.py --steps 300 --out runs/walk_demo

Headless-safe: with no GL context the player falls back to the software
capsule renderer (physics/softrender.py) so a video artifact (.avi via cv2,
else .npy frame stack) is always produced. On a laptop-class run, --steps
300 takes a couple of minutes on CPU; the sampled motion at that point is
noisy but the full pipeline is exercised. For reference-quality motion use
--steps 40000 (BASELINE.md walk40k: best loss 7.3e-5).
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--out", default="runs/walk_demo")
    p.add_argument("--num-samples", type=int, default=2)
    p.add_argument("--skip-train", action="store_true",
                   help="reuse an existing checkpoint in --out")
    args = p.parse_args(argv)

    from deepmimic_diffusion_mujoco_tpu.cli import play, sample, train

    clip = os.path.join(REPO, "data/motions/humanoid3d_walk.txt")

    if not args.skip_train:
        # 1) train: reference notebook config scaled to a demo budget
        train.main([
            "--data", clip,
            "--steps", str(args.steps),
            "--out", args.out,
            "--set", "train.log_every=50",
            f"train.save_every={max(args.steps // 2, 1)}",
            "train.scan_chunk=10",
        ])

    # 2) sample the trained model -> (T, 35) .npy motions + metadata JSON
    sample_dir = os.path.join(args.out, "samples")
    sample.main([
        "--run", args.out,
        "--num", str(args.num_samples),
        "--out", sample_dir,
    ])
    motions = sorted(glob.glob(os.path.join(sample_dir, "*.npy")))
    if not motions:
        raise SystemExit(f"no sampled motions found in {sample_dir}")

    # 3) play the first sample through the MuJoCo-parity player and write
    # the video (GL offscreen when available, software renderer otherwise)
    video = os.path.join(args.out, "walk_demo.avi")
    play.main([motions[0], "--loops", "2", "--video", video])
    artifacts = [f for f in (video, video + ".npy") if os.path.exists(f)]
    print(f"demo complete: motion={motions[0]} video={artifacts}")


if __name__ == "__main__":
    main()
