"""SE(3) group/Lie-algebra tests (reference g2o se3quat.h conventions)."""

import jax.numpy as jnp
import numpy as np

from cube_slam_wu_tpu.core.se3 import SE3


def _random_se3(n, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    tangent = rng.normal(size=(n, 6)) * scale
    # keep |omega| < pi so exp/log roundtrips to the principal value
    w = tangent[:, :3]
    norms = np.linalg.norm(w, axis=-1, keepdims=True)
    tangent[:, :3] = np.where(norms > 3.0, w * (3.0 / norms), w)
    tangent = jnp.asarray(tangent)
    return SE3.exp(tangent), tangent


def test_exp_log_roundtrip():
    T, tangent = _random_se3(64, seed=1)
    np.testing.assert_allclose(np.asarray(T.log()), np.asarray(tangent), atol=1e-9)


def test_exp_log_small_angles():
    T, tangent = _random_se3(64, seed=2, scale=1e-8)
    np.testing.assert_allclose(np.asarray(T.log()), np.asarray(tangent), atol=1e-12)


def test_compose_inverse():
    A, _ = _random_se3(16, seed=3)
    B, _ = _random_se3(16, seed=4)
    AB = A.compose(B)
    np.testing.assert_allclose(
        np.asarray(AB.matrix()), np.asarray(A.matrix() @ B.matrix()), atol=1e-10
    )
    I = A.compose(A.inverse())
    np.testing.assert_allclose(np.asarray(I.trans), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.abs(np.asarray(I.quat[..., 0])), 1.0, atol=1e-10)


def test_apply_matches_matrix():
    A, _ = _random_se3(8, seed=5)
    pts = jnp.asarray(np.random.default_rng(6).normal(size=(8, 3)))
    out = np.asarray(A.apply(pts))
    M = np.asarray(A.matrix())
    expect = np.einsum("nij,nj->ni", M[:, :3, :3], np.asarray(pts)) + M[:, :3, 3]
    np.testing.assert_allclose(out, expect, atol=1e-10)


def test_tangent_order_rotation_first():
    """g2o convention: tangent[:3]=omega, tangent[3:]=upsilon (se3quat.h:275)."""
    t = jnp.asarray([0.0, 0.0, np.pi / 2, 1.0, 0.0, 0.0])
    T = SE3.exp(t)
    R = np.asarray(T.rotation_matrix())
    expect_R = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(R, expect_R, atol=1e-12)
    # translation goes through V, not identity: for 90deg z-rotation with
    # upsilon=[1,0,0], t = V @ [1,0,0]
    theta = np.pi / 2
    a = np.sin(theta) / theta
    b = (1 - np.cos(theta)) / theta**2
    Om = np.array([[0.0, -theta, 0.0], [theta, 0.0, 0.0], [0.0, 0.0, 0.0]])
    V = np.eye(3) + b * Om + ((theta - np.sin(theta)) / theta**3) * (Om @ Om)
    np.testing.assert_allclose(np.asarray(T.trans), V @ np.array([1.0, 0, 0]), atol=1e-12)
    del a


def test_tum_row_roundtrip():
    row = jnp.asarray([-2.5508, 0.9872, 1.1019, -0.487105, 0.767307, -0.351903, 0.223902])
    T = SE3.from_xyzq(row)
    back = np.asarray(T.to_xyzq())
    # quaternion sign may flip; compare up to sign on quat part
    np.testing.assert_allclose(back[:3], np.asarray(row[:3]), atol=1e-12)
    q_in = np.asarray(row[3:]) / np.linalg.norm(np.asarray(row[3:]))
    q_out = back[3:]
    if np.dot(q_in, q_out) < 0:
        q_out = -q_out
    np.testing.assert_allclose(q_out, q_in, atol=1e-9)


def test_log_matches_g2o_formula():
    """Cross-check log against the explicit g2o V_inv formula on one pose."""
    T, _ = _random_se3(1, seed=9)
    R = np.asarray(T.rotation_matrix())[0]
    t = np.asarray(T.trans)[0]
    d = 0.5 * (np.trace(R) - 1)
    dR = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    theta = np.arccos(d)
    omega = theta / (2 * np.sqrt(1 - d * d)) * dR
    Om = np.array(
        [[0, -omega[2], omega[1]], [omega[2], 0, -omega[0]], [-omega[1], omega[0], 0]]
    )
    V_inv = (
        np.eye(3)
        - 0.5 * Om
        + (1 - theta / (2 * np.tan(theta / 2))) / theta**2 * (Om @ Om)
    )
    expect = np.concatenate([omega, V_inv @ t])
    np.testing.assert_allclose(np.asarray(T.log())[0], expect, atol=1e-10)
