"""Mocap parser tests: structural properties + golden parity vs the
reference MocapDM run in-process (via a pyquaternion shim oracle)."""
import os
import sys

import numpy as np
import pytest

from deepmimic_diffusion_mujoco_tpu.data import mocap
from deepmimic_diffusion_mujoco_tpu.data.skeleton import (
    MOTION_CLASSES,
    QPOS_DIM,
    QVEL_DIM,
)

DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data", "motions")
REF_ROOT = "/root/reference/diffusion"

CLIP_FRAMES = {  # SURVEY.md section 2.1
    "humanoid3d_walk": 39,
    "humanoid3d_run": 25,
    "humanoid3d_spinkick": 78,
    "humanoid3d_backflip": 29,
    "humanoid3d_cartwheel": 164,
    "humanoid3d_jump": 107,
    "humanoid3d_roll": 121,
    "humanoid3d_dance_a": 98,
    "humanoid3d_dance_b": 153,
}


def clip_path(name):
    return os.path.join(DATA_DIR, f"{name}.txt")


@pytest.mark.parametrize("name", sorted(MOTION_CLASSES))
def test_shapes_and_basic_invariants(name):
    clip = mocap.load_clip(clip_path(name))
    T = CLIP_FRAMES[name]
    assert clip.qpos.shape == (T, QPOS_DIM)
    assert clip.qvel.shape == (T, QVEL_DIM)
    assert clip.combined().shape == (T, QPOS_DIM + QVEL_DIM)
    # first-frame velocities are zero by construction
    np.testing.assert_allclose(clip.qvel[0], 0.0)
    # root quaternion stays near unit-norm after alignment (source data is
    # only ~1e-2 accurate; alignment must preserve, not re-normalize — parity)
    np.testing.assert_allclose(
        np.linalg.norm(clip.qpos[:, 3:7], axis=-1), 1.0, atol=1e-2
    )
    # heights are plausible (character stands on Z-up ground)
    assert 0.0 < clip.qpos[:, 2].mean() < 2.0
    assert clip.motion_class == MOTION_CLASSES[name]


def test_inverse_roundtrip():
    clip = mocap.load_clip(clip_path("humanoid3d_walk"))
    frames = mocap.qpos_to_dp_frame(clip.qpos, clip.dt)
    clip2 = mocap.parse_frames(frames, name="humanoid3d_walk")
    np.testing.assert_allclose(clip2.qpos, clip.qpos, atol=1e-8)


def _load_reference_mocapdm():
    """Import the reference MocapDM with a pyquaternion shim injected."""
    import importlib

    sys.path.insert(0, os.path.dirname(__file__))
    import _pyquaternion_shim

    sys.modules["pyquaternion"] = _pyquaternion_shim
    sys.path.insert(0, REF_ROOT)
    for m in ("utils", "utils.mocap_util", "utils.mocap_v2", "utils.transformations"):
        sys.modules.pop(m, None)
    ref = importlib.import_module("utils.mocap_v2")
    return ref.MocapDM


@pytest.mark.skipif(not os.path.isdir(REF_ROOT), reason="reference not mounted")
@pytest.mark.parametrize("name", sorted(MOTION_CLASSES))
def test_golden_parity_with_reference_parser(name):
    """qpos/qvel must match the reference parser to float64 precision."""
    MocapDM = _load_reference_mocapdm()
    dm = MocapDM()
    dm.load_mocap(clip_path(name))
    ref_qpos = np.array(dm.data_config)
    ref_qvel = np.array(dm.data_vel)

    clip = mocap.load_clip(clip_path(name))
    np.testing.assert_allclose(clip.qpos, ref_qpos, atol=1e-10)
    np.testing.assert_allclose(clip.qvel, ref_qvel, atol=1e-8)
