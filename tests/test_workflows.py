"""The seven conditioned-sampling workflows through the CLI (untrained smoke
mode, mirroring the notebooks' pre-training sanity cells), with the
reference's own output checks where it defines them."""
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "..", "data", "motions")
WALK = os.path.join(DATA, "humanoid3d_walk.txt")
BACKFLIP = os.path.join(DATA, "humanoid3d_backflip.txt")

COMMON = ["--untrained", "--clip", WALK, "--num", "1", "--steps", "5",
          "--dim", "16"]


def _run(tmp_path, workflow, extra=()):
    from deepmimic_diffusion_mujoco_tpu.cli import workflows

    out = str(tmp_path / workflow)
    workflows.main([workflow, *COMMON, *extra, "--out", out])
    files = sorted(os.listdir(out))
    assert files, workflow
    return np.load(os.path.join(out, files[0]))


def test_editing(tmp_path):
    m = _run(tmp_path, "editing")
    # the reference's check: shoulder dims exactly held, elbows at 1.57
    np.testing.assert_allclose(m[:, 13:16], 0.0)
    np.testing.assert_allclose(m[:, 16], 1.57, atol=1e-6)


def test_start_with_motion_stays_near_clip(tmp_path):
    from deepmimic_diffusion_mujoco_tpu.data.mocap import load_clip

    m = _run(tmp_path, "start-with-motion")
    clip = load_clip(WALK).qpos
    clip = clip[: len(clip) - len(clip) % 8]
    # 2 shallow denoise steps: output stays close to the source motion
    assert np.abs(m - clip).mean() < 1.0


def test_short_projection_horizon(tmp_path):
    from deepmimic_diffusion_mujoco_tpu.data.mocap import load_clip

    m = _run(tmp_path, "short-projection")
    T = load_clip(WALK).qpos.shape[0]
    T8 = T - T % 8
    assert m.shape[0] == int(T8 * 0.75) // 8 * 8


def test_long_projection_keyframes(tmp_path):
    from deepmimic_diffusion_mujoco_tpu.data.mocap import load_clip

    m = _run(tmp_path, "long-projection")
    clip = load_clip(WALK).qpos
    clip = clip[: len(clip) - len(clip) % 8]
    assert m.shape[0] == clip.shape[0] * 3
    # keyframe 0 is clamped to the tiled motion on dims 3:
    np.testing.assert_allclose(m[0, 3:35], clip[0, 3:35], atol=1e-5)


def test_inbetween_edges_clamped(tmp_path):
    from deepmimic_diffusion_mujoco_tpu.data.mocap import load_clip

    m = _run(tmp_path, "inbetween")
    clip = load_clip(WALK).qpos
    clip = clip[: len(clip) - len(clip) % 8]
    edge = clip.shape[0] // 4
    np.testing.assert_allclose(m[:edge], clip[:edge], atol=1e-5)
    np.testing.assert_allclose(m[-edge:], clip[-edge:], atol=1e-5)
    # the middle was free to change
    assert np.abs(m[edge:-edge] - clip[edge:-edge]).max() > 1e-3


def test_blend_clamps_outside_seam(tmp_path):
    m = _run(tmp_path, "blend", extra=["--clip2", BACKFLIP])
    from deepmimic_diffusion_mujoco_tpu.data.mocap import load_clip

    walk = load_clip(WALK).qpos
    walk = walk[: len(walk) - len(walk) % 8]
    # frames well before the seam equal the walk clip
    np.testing.assert_allclose(m[:5], walk[:5], atol=1e-5)


def test_steer_root_path(tmp_path):
    m = _run(tmp_path, "steer")
    path_x = np.linspace(0, 2.0, 16)
    np.testing.assert_allclose(m[:16, 0], path_x, atol=1e-5)
    np.testing.assert_allclose(m[:16, 1], 0.0, atol=1e-5)
