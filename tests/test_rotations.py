"""Rotation-module correctness: scipy oracle + reference Gohlke parity."""
import importlib.util
import os

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from deepmimic_diffusion_mujoco_tpu.utils import rotations as rot

REF_TRANSFORMATIONS = "/root/reference/diffusion/utils/transformations.py"


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mul_matches_scipy():
    qa, qb = random_quats(64, 1), random_quats(64, 2)
    ours = rot.quat_mul(qa, qb)
    # scipy uses xyzw ordering
    sa = R.from_quat(qa[:, [1, 2, 3, 0]])
    sb = R.from_quat(qb[:, [1, 2, 3, 0]])
    expect = (sa * sb).as_quat()[:, [3, 0, 1, 2]]
    # quaternion double cover: compare up to sign
    sign = np.sign(np.sum(ours * expect, axis=-1, keepdims=True))
    np.testing.assert_allclose(ours, sign * expect, atol=1e-12)


def test_quat_to_mat_matches_scipy():
    q = random_quats(64, 3)
    np.testing.assert_allclose(
        rot.quat_to_mat(q), R.from_quat(q[:, [1, 2, 3, 0]]).as_matrix(), atol=1e-12
    )


def test_euler_rxyz_roundtrip_and_scipy():
    q = random_quats(256, 4)
    e = rot.euler_rxyz_from_quat(q)
    # scipy intrinsic XYZ: R = Rx(a) @ Ry(b) @ Rz(c)
    expect = R.from_quat(q[:, [1, 2, 3, 0]]).as_euler("XYZ")
    np.testing.assert_allclose(e, expect, atol=1e-9)
    # composition round trip
    q2 = rot.quat_from_euler_rxyz(e)
    np.testing.assert_allclose(
        rot.quat_to_mat(q2), rot.quat_to_mat(q), atol=1e-9
    )


def test_euler_gimbal_lock_stable():
    # b = +-pi/2 exactly
    for b in (np.pi / 2, -np.pi / 2):
        q = rot.quat_from_euler_rxyz(np.array([0.3, b, 0.7]))
        e = rot.euler_rxyz_from_quat(q)
        q2 = rot.quat_from_euler_rxyz(e)
        np.testing.assert_allclose(
            rot.quat_to_mat(q2), rot.quat_to_mat(q), atol=1e-7
        )


@pytest.mark.skipif(
    not os.path.exists(REF_TRANSFORMATIONS), reason="reference not mounted"
)
def test_euler_parity_with_reference_gohlke():
    """Golden parity with the vendored transformations.py the reference uses."""
    spec = importlib.util.spec_from_file_location("ref_tf", REF_TRANSFORMATIONS)
    ref_tf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_tf)

    q = random_quats(128, 5)
    ours = rot.euler_rxyz_from_quat(q)
    for i in range(q.shape[0]):
        # reference call site reorders wxyz -> xyzw (mocap_v2.py:286-287)
        xyzw = q[i][[1, 2, 3, 0]]
        expect = np.array(ref_tf.euler_from_quaternion(xyzw, axes="rxyz"))
        np.testing.assert_allclose(ours[i], expect, atol=1e-9)


@pytest.mark.skipif(
    not os.path.exists(REF_TRANSFORMATIONS), reason="reference not mounted"
)
def test_quat_from_euler_parity_with_reference_gohlke():
    spec = importlib.util.spec_from_file_location("ref_tf2", REF_TRANSFORMATIONS)
    ref_tf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_tf)

    rng = np.random.default_rng(6)
    angles = rng.uniform(-np.pi, np.pi, size=(64, 3))
    for a in angles:
        ours = rot.quat_from_euler_rxyz(a)
        expect_xyzw = ref_tf.quaternion_from_euler(*a, axes="rxyz")
        expect = np.array(expect_xyzw)[[3, 0, 1, 2]]
        sign = np.sign(np.dot(ours, expect))
        np.testing.assert_allclose(ours, sign * expect, atol=1e-9)


def test_align_rotation_is_frame_change():
    """align_rotation must equal the Y-up->Z-up change of basis M R M^T."""
    M = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])  # Rx(+90)
    q = random_quats(32, 7)
    got = rot.quat_to_mat(rot.align_rotation(q))
    expect = M @ rot.quat_to_mat(q) @ M.T
    np.testing.assert_allclose(got, expect, atol=1e-12)


def test_align_position():
    p = np.array([[1.0, 2.0, 3.0], [0.5, -1.0, 2.0]])
    np.testing.assert_allclose(rot.align_position(p), [[1, -3, 2], [0.5, -2, -1]])


def test_wrap_angle_convention():
    # pyquaternion wraps into (-pi, pi] with -pi -> pi
    np.testing.assert_allclose(rot.wrap_angle(np.pi), np.pi)
    np.testing.assert_allclose(rot.wrap_angle(-np.pi), np.pi)
    np.testing.assert_allclose(rot.wrap_angle(3 * np.pi / 2), -np.pi / 2)
    np.testing.assert_allclose(rot.wrap_angle(0.3), 0.3)


def test_angular_velocity_inverts_integration():
    """omega = angvel(q0, q1) must satisfy q1 = q0 * exp(0.5*dt*omega)."""
    q0 = random_quats(16, 8)
    rng = np.random.default_rng(9)
    axis = rng.normal(size=(16, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(-1.5, 1.5, size=16)
    dt = 0.0333
    dq = np.concatenate(
        [np.cos(angle / 2)[:, None], np.sin(angle / 2)[:, None] * axis], axis=-1
    )
    q1 = rot.quat_mul(q0, dq)
    omega = rot.quat_angular_velocity(q0, q1, dt)
    np.testing.assert_allclose(omega, (angle / dt)[:, None] * axis, atol=1e-9)
