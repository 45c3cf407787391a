"""Camera-object-point BA with Schur complement: synthetic SfM convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cube_slam_wu_tpu.core.se3 import SE3
from cube_slam_wu_tpu.slam import point_ba
from cube_slam_wu_tpu.slam.point_ba import PointFactors
from test_ba import _make_synthetic

K = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1.0]])


def _synthetic_sfm(F=6, P=40, noise=0.05, seed=0):
    graph, true_Tcw, cube_true = _make_synthetic(F=F, n_active=F, noise=noise, seed=seed)
    rng = np.random.default_rng(seed + 100)
    # points in front of the cameras (cameras near origin looking +z)
    pts_true = jnp.asarray(
        np.stack(
            [
                rng.uniform(-2, 2, P),
                rng.uniform(-1.5, 1.5, P),
                rng.uniform(4.0, 9.0, P),
            ],
            axis=1,
        )
    )
    uv = jax.vmap(
        lambda T: jax.vmap(lambda X: point_ba.project_point(T, X, K))(pts_true)
    )(true_Tcw)
    inside = (
        (uv[..., 0] > 0) & (uv[..., 0] < 640) & (uv[..., 1] > 0) & (uv[..., 1] < 480)
    )
    pts_init = pts_true + jnp.asarray(rng.normal(size=(P, 3)) * noise)
    factors = PointFactors(
        points=pts_init,
        point_mask=jnp.ones(P, bool),
        obs_uv=uv,
        obs_mask=inside,
        obs_weight=jnp.ones((F, P)),
    )
    return graph, factors, true_Tcw, pts_true, cube_true


@pytest.mark.slow
def test_point_ba_converges_to_truth():
    graph, factors, true_Tcw, pts_true, cube_true = _synthetic_sfm()
    res = point_ba.optimize(graph, factors, K, iterations=12)
    assert float(res.chi2) < 1e-6, float(res.chi2)
    pose_err = np.asarray(res.cam_Tcw.compose(true_Tcw.inverse()).log())
    assert np.abs(pose_err).max() < 5e-4, np.abs(pose_err).max()
    pt_err = np.linalg.norm(np.asarray(res.points - pts_true), axis=1)
    # points need several observations for their depth to be well-constrained
    well_observed = np.asarray(factors.obs_mask).sum(axis=0) >= 3
    assert pt_err[well_observed].max() < 2e-3, pt_err[well_observed].max()
    cube_err = np.asarray(res.cube.log_error(cube_true))
    assert np.abs(cube_err).max() < 1e-4


@pytest.mark.slow
def test_point_ba_masked_points_fixed():
    graph, factors, _, _, _ = _synthetic_sfm(seed=2)
    frozen = factors._replace(
        point_mask=factors.point_mask.at[:10].set(False)
    )
    before = np.asarray(frozen.points[:10])
    res = point_ba.optimize(graph, frozen, K, iterations=4)
    np.testing.assert_allclose(np.asarray(res.points[:10]), before, atol=1e-12)


@pytest.mark.slow
def test_point_ba_beats_pointless_ba():
    """Adding point observations should reduce pose error vs cuboid-only BA
    when odometry is noisy."""
    from cube_slam_wu_tpu.slam import ba

    graph, factors, true_Tcw, _, _ = _synthetic_sfm(noise=0.1, seed=5)
    rng = np.random.default_rng(9)
    noisy_odom = SE3.exp(jnp.asarray(rng.normal(size=(6, 6)) * 0.02)).compose(graph.odom)
    graph = graph._replace(odom=noisy_odom)

    res_plain = ba.optimize(graph, iterations=10)
    res_pts = point_ba.optimize(graph, factors, K, iterations=10)
    err_plain = np.abs(np.asarray(res_plain.cam_Tcw.compose(true_Tcw.inverse()).log())).max()
    err_pts = np.abs(np.asarray(res_pts.cam_Tcw.compose(true_Tcw.inverse()).log())).max()
    assert err_pts < err_plain, (err_pts, err_plain)


def test_triangulation_exact_on_synthetic():
    """Batched DLT recovers exact points from noiseless projections."""
    rng = np.random.default_rng(0)
    F, P = 6, 20
    tang = np.zeros((F, 6))
    tang[:, 3] = np.linspace(0, 1.0, F)  # x-translating camera
    Tcw = SE3.exp(jnp.asarray(tang))
    pts_true = jnp.asarray(
        np.stack(
            [rng.uniform(-2, 2, P), rng.uniform(-1.5, 1.5, P), rng.uniform(4, 9, P)], 1
        )
    )
    uv = jax.vmap(
        lambda T: jax.vmap(lambda X: point_ba.project_point(T, X, K))(pts_true)
    )(Tcw)
    X, ok = point_ba.triangulate_points(Tcw, uv, jnp.ones((F, P), bool), K)
    assert np.asarray(ok).all()
    np.testing.assert_allclose(np.asarray(X), np.asarray(pts_true), atol=1e-9)


def test_triangulation_rejects_single_view():
    Tcw = SE3.identity((3,), jnp.float64)
    uv = jnp.full((3, 4, 2), 100.0)
    mask = jnp.zeros((3, 4), bool).at[0, :].set(True)  # one observation each
    _, ok = point_ba.triangulate_points(Tcw, uv, mask, K)
    assert not np.asarray(ok).any()


@pytest.mark.slow
def test_stereo_projection_edges():
    """Stereo observations (u, v, u_right) constrain depth directly
    (EdgeStereoSE3ProjectXYZ coverage): with a single camera frame, mono
    observations cannot fix point depth but stereo ones can."""
    from cube_slam_wu_tpu.slam.point_ba import PointFactors

    rng = np.random.default_rng(3)
    F, P = 2, 12
    Tcw = SE3.identity((F,), jnp.float64)
    pts_true = jnp.asarray(
        np.stack([rng.uniform(-1, 1, P), rng.uniform(-1, 1, P), rng.uniform(4, 8, P)], 1)
    )
    baseline = 0.5 * 500.0  # fx * b
    uvr = jax.vmap(
        lambda T: jax.vmap(
            lambda X: point_ba.project_point_stereo(T, X, K, baseline)
        )(pts_true)
    )(Tcw)
    graph, _, _ = _make_synthetic(F=2, n_active=2, noise=0.0, seed=1)
    pts_init = pts_true * jnp.asarray([1.0, 1.0, 1.3])  # depth-biased init
    factors = PointFactors(
        points=pts_init,
        point_mask=jnp.ones(P, bool),
        obs_uv=uvr[..., :2],
        obs_mask=jnp.ones((F, P), bool),
        obs_weight=jnp.ones((F, P)),
        obs_ur=uvr[..., 2],
        stereo_mask=jnp.ones((F, P), bool),
        baseline=baseline,
    )
    res = point_ba.optimize(graph, factors, K, iterations=10, fix_first=True)
    err = np.linalg.norm(np.asarray(res.points - pts_true), axis=1)
    assert err.max() < 1e-3, err.max()
