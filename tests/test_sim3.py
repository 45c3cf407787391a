"""Sim(3) group tests (g2o sim3.h coverage)."""

import jax.numpy as jnp
import numpy as np

from cube_slam_wu_tpu.core.sim3 import Sim3


def _random_tangent(n, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    t = rng.normal(size=(n, 7)) * scale
    w = t[:, :3]
    norms = np.linalg.norm(w, axis=-1, keepdims=True)
    t[:, :3] = np.where(norms > 3.0, w * 3.0 / norms, w)
    t[:, 6] = np.clip(t[:, 6], -1.5, 1.5)
    return jnp.asarray(t)


def test_exp_log_roundtrip():
    t = _random_tangent(64, seed=1)
    T = Sim3.exp(t)
    np.testing.assert_allclose(np.asarray(T.log()), np.asarray(t), atol=1e-8)


def test_exp_log_small():
    t = _random_tangent(32, seed=2, scale=1e-6)
    T = Sim3.exp(t)
    np.testing.assert_allclose(np.asarray(T.log()), np.asarray(t), atol=1e-10)


def test_zero_sigma_matches_se3():
    from cube_slam_wu_tpu.core.se3 import SE3

    t7 = _random_tangent(16, seed=3)
    t7 = t7.at[:, 6].set(0.0)
    S = Sim3.exp(t7)
    T = SE3.exp(t7[:, :6])
    np.testing.assert_allclose(np.asarray(S.scale), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(S.trans), np.asarray(T.trans), atol=1e-9)
    np.testing.assert_allclose(np.abs(np.sum(S.quat * T.quat, axis=-1)), 1.0, atol=1e-9)


def test_compose_inverse_apply():
    a = Sim3.exp(_random_tangent(8, seed=4))
    b = Sim3.exp(_random_tangent(8, seed=5))
    pts = jnp.asarray(np.random.default_rng(6).normal(size=(8, 3)))
    lhs = a.compose(b).apply(pts)
    rhs = a.apply(b.apply(pts))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-9)
    ident = a.compose(a.inverse())
    np.testing.assert_allclose(np.asarray(ident.scale), 1.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ident.trans), 0.0, atol=1e-9)


def test_scale_action():
    S = Sim3.exp(jnp.asarray([0.0, 0, 0, 0, 0, 0, np.log(2.0)]))
    out = np.asarray(S.apply(jnp.asarray([1.0, 2.0, 3.0])))
    np.testing.assert_allclose(out, [2.0, 4.0, 6.0], atol=1e-9)


def test_exp_matches_matrix_exponential():
    """Sim3.exp against a brute-force 4x4 matrix exponential of the
    generator [[skew(omega)+sigma*I, upsilon],[0,0]] (the exp/log roundtrip
    tests alone cannot catch a wrong W coupling: log inverts with the same
    W, so they are self-consistent even when W is wrong)."""
    from scipy.linalg import expm

    from cube_slam_wu_tpu.core import rotations as rot

    rng = np.random.default_rng(0)
    tangents = [
        np.array([0.3, -0.2, 0.5, 1.0, 2.0, -0.5, 0.4]),
        np.array([1e-6, 2e-6, -1e-6, 0.3, -0.2, 0.1, 1e-7]),
        np.array([0.5, 0.1, -0.3, 1.0, 0.0, 0.0, 0.0]),
        np.array([0.0, 0.0, 0.0, 0.5, -1.0, 2.0, -0.3]),
    ] + [rng.normal(size=7) * 0.5 for _ in range(4)]
    for tan in tangents:
        om, up, sg = tan[:3], tan[3:6], tan[6]
        Om = np.array(
            [[0, -om[2], om[1]], [om[2], 0, -om[0]], [-om[1], om[0], 0]]
        )
        G = np.zeros((4, 4))
        G[:3, :3] = Om + sg * np.eye(3)
        G[:3, 3] = up
        M = expm(G)
        s_ref = np.cbrt(np.linalg.det(M[:3, :3]))
        R_ref = M[:3, :3] / s_ref
        ours = Sim3.exp(jnp.asarray(tan))
        np.testing.assert_allclose(float(ours.scale), s_ref, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(rot.quat_to_rot(ours.quat)), R_ref, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(ours.trans), M[:3, 3], atol=1e-9
        )
