"""Marginal covariance extraction (ba.marginal_covariance).

Validates the Gauss-Newton covariance against a Monte-Carlo estimate: the
sample covariance of the BA estimator under known measurement noise must
match the analytic inverse-information blocks (g2o computeMarginals
analogue, Thirdparty/g2o g2o/core/sparse_optimizer.h).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cube_slam_wu_tpu.core.cuboid import Cuboid
from cube_slam_wu_tpu.core.se3 import SE3
from cube_slam_wu_tpu.slam import ba
from cube_slam_wu_tpu.slam.graph import CameraObjectGraph


def _make_graph(F, noise9, weight):
    """Graph with exact odometry and noisy cuboid measurements.

    noise9: (F, 9) tangent perturbations applied to the camera-frame cuboid
    measurement of each frame; weight is the sqrt-information (1/sigma).
    """
    O = 1
    dtype = jnp.float64
    t = np.arange(F)
    cam_pos = np.stack([0.1 * t, 0.02 * t, np.zeros(F)], -1)
    yaws = 0.05 * t
    quats = np.stack(
        [np.cos(yaws / 2), np.zeros(F), np.zeros(F), np.sin(yaws / 2)], -1
    )
    cam_Twc = SE3(jnp.asarray(quats, dtype), jnp.asarray(cam_pos, dtype))
    cam_Tcw = cam_Twc.inverse()

    cube_true = Cuboid.from_minimal(
        jnp.asarray([1.0, 0.5, 0.3, 0.0, 0.0, 0.4, 0.4, 0.3, 0.25], dtype)
    )

    g = CameraObjectGraph.empty(F, O, dtype)
    g = g._replace(
        cam_Tcw=cam_Tcw,
        frame_mask=jnp.ones(F, bool),
        odom=SE3(
            cam_Tcw.quat, cam_Tcw.trans
        ).compose(  # odom_i = Tcw_i * Twc_{i-1}
            SE3(
                jnp.roll(cam_Twc.quat, 1, 0), jnp.roll(cam_Twc.trans, 1, 0)
            )
        ),
        odom_mask=jnp.arange(F) > 0,
        cube_valid=jnp.ones(O, bool),
        cube=jax.tree.map(lambda a: a[None], cube_true),
    )

    # camera-frame measurements = true cuboid perturbed in tangent space
    cube_cam = jax.vmap(lambda T: cube_true.transform_to(T))(cam_Twc)  # (F,)
    meas = jax.vmap(lambda c, d: c.exp_update(d))(cube_cam, jnp.asarray(noise9, dtype))
    g = g._replace(
        cube_meas=jax.tree.map(lambda a: a[:, None], meas),
        cube_meas_mask=jnp.ones((F, O), bool),
        cube_meas_weight=jnp.full((F, O), weight, dtype),
    )
    return g, cube_true


@pytest.mark.slow
def test_blocks_symmetric_psd_and_gauge_zero():
    F = 4
    g, _ = _make_graph(F, np.zeros((F, 9)), weight=2.0)
    cov = ba.marginal_covariance(g, fix_first=True)
    cam = np.asarray(cov.cam)
    cube = np.asarray(cov.cube)
    # gauge: fixed first camera block is exactly zero and flagged invalid
    assert not bool(cov.cam_valid[0])
    np.testing.assert_array_equal(cam[0], 0.0)
    for i in range(1, F):
        np.testing.assert_allclose(cam[i], cam[i].T, atol=1e-12)
        assert np.linalg.eigvalsh(cam[i]).min() > -1e-12
    np.testing.assert_allclose(cube[0], cube[0].T, atol=1e-12)
    assert np.linalg.eigvalsh(cube[0]).min() > 0


def test_covariance_shrinks_with_information():
    F = 4
    g_lo, _ = _make_graph(F, np.zeros((F, 9)), weight=1.0)
    g_hi, _ = _make_graph(F, np.zeros((F, 9)), weight=3.0)
    tr_lo = float(jnp.trace(ba.marginal_covariance(g_lo).cube[0]))
    tr_hi = float(jnp.trace(ba.marginal_covariance(g_hi).cube[0]))
    assert tr_hi < tr_lo / 4  # 9x information -> ~9x smaller covariance


@pytest.mark.slow
def test_monte_carlo_matches_predicted_covariance():
    F, T = 4, 256
    sigma = 0.02
    weight = 1.0 / sigma

    g0, cube_true = _make_graph(F, np.zeros((F, 9)), weight)
    pred = np.asarray(ba.marginal_covariance(g0).cube[0])  # at the truth

    rng = np.random.default_rng(7)
    noises = rng.normal(0.0, sigma, size=(T, F, 9))

    def trial(noise9):
        g, _ = _make_graph(F, noise9, weight)
        res = ba.optimize(g, iterations=8, fix_first=True)
        # estimator error of the cuboid in its tangent space
        return res.cube.log_error(jax.tree.map(lambda a: a[None], cube_true))[0]

    # _make_graph builds numpy constants; loop outside jit, batch via stack
    errs = np.stack([np.asarray(trial(noises[i])) for i in range(T)])
    sample = errs.T @ errs / T

    # traces agree within Monte-Carlo error; per-dim variances within 2x
    assert 0.6 < np.trace(sample) / np.trace(pred) < 1.6, (
        np.trace(sample),
        np.trace(pred),
    )
    ratio = np.diag(sample) / np.maximum(np.diag(pred), 1e-18)
    assert np.all(ratio > 0.4) and np.all(ratio < 2.5), ratio
