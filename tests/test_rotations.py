"""Unit tests for rotation conversions (reference matrix_utils.cpp:19-98)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cube_slam_wu_tpu.core import rotations as rot


def _random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[:, 0] < 0] *= -1
    return jnp.asarray(q)


def test_quat_rot_roundtrip():
    q = _random_quats(64)
    R = rot.quat_to_rot(q)
    q2 = rot.rot_to_quat(R)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-10)


def test_rot_orthonormal():
    q = _random_quats(16, seed=3)
    R = np.asarray(rot.quat_to_rot(q))
    eye = np.broadcast_to(np.eye(3), R.shape)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-9)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-9)


def test_quat_multiply_matches_rot_product():
    qa, qb = _random_quats(8, 1), _random_quats(8, 2)
    Rab = np.asarray(rot.quat_to_rot(rot.quat_multiply(qa, qb)))
    np.testing.assert_allclose(
        Rab, np.asarray(rot.quat_to_rot(qa)) @ np.asarray(rot.quat_to_rot(qb)), atol=1e-12
    )


def test_quat_rotate_matches_matrix():
    q = _random_quats(8, 5)
    v = jnp.asarray(np.random.default_rng(7).normal(size=(8, 3)))
    np.testing.assert_allclose(
        np.asarray(rot.quat_rotate(q, v)),
        np.einsum("nij,nj->ni", np.asarray(rot.quat_to_rot(q)), np.asarray(v)),
        atol=1e-12,
    )


def test_euler_zyx_roundtrip():
    rng = np.random.default_rng(11)
    roll = jnp.asarray(rng.uniform(-1.2, 1.2, size=32))
    pitch = jnp.asarray(rng.uniform(-1.2, 1.2, size=32))
    yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, size=32))
    q = rot.euler_zyx_to_quat(roll, pitch, yaw)
    r2, p2, y2 = rot.quat_to_euler_zyx(q)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(roll), atol=1e-10)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(pitch), atol=1e-10)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(yaw), atol=1e-10)
    # matrix route agrees with quaternion route
    R = rot.euler_zyx_to_rot(roll, pitch, yaw)
    np.testing.assert_allclose(np.asarray(R), np.asarray(rot.quat_to_rot(q)), atol=1e-10)
    r3, p3, y3 = rot.rot_to_euler_zyx(R)
    np.testing.assert_allclose(np.asarray(r3), np.asarray(roll), atol=1e-10)
    np.testing.assert_allclose(np.asarray(y3), np.asarray(yaw), atol=1e-10)


def test_euler_zyx_is_Rz_Ry_Rx():
    """ZYX convention: R = Rz(yaw) @ Ry(pitch) @ Rx(roll)."""
    roll, pitch, yaw = 0.3, -0.4, 1.1
    c, s = np.cos, np.sin
    Rx = np.array([[1, 0, 0], [0, c(roll), -s(roll)], [0, s(roll), c(roll)]])
    Ry = np.array([[c(pitch), 0, s(pitch)], [0, 1, 0], [-s(pitch), 0, c(pitch)]])
    Rz = np.array([[c(yaw), -s(yaw), 0], [s(yaw), c(yaw), 0], [0, 0, 1]])
    R = rot.euler_zyx_to_rot(jnp.asarray(roll), jnp.asarray(pitch), jnp.asarray(yaw))
    np.testing.assert_allclose(np.asarray(R), Rz @ Ry @ Rx, atol=1e-12)


def test_normalize_to_pi_half():
    vals = jnp.asarray([0.2, 2.0, -2.0, np.pi / 2, -np.pi / 2 + 1e-6])
    out = np.asarray(rot.normalize_to_pi_half(vals))
    assert np.all(out <= np.pi / 2 + 1e-9) and np.all(out >= -np.pi / 2 - 1e-9)
    np.testing.assert_allclose(out[1], 2.0 - np.pi, atol=1e-12)
    np.testing.assert_allclose(out[2], -2.0 + np.pi, atol=1e-12)


@pytest.mark.parametrize("dtype", [jnp.float32])
def test_f32_path(dtype):
    q = _random_quats(4).astype(dtype)
    R = rot.quat_to_rot(q)
    assert R.dtype == dtype
    np.testing.assert_allclose(
        np.asarray(rot.rot_to_quat(R)), np.asarray(q), atol=1e-6
    )
