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
