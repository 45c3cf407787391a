"""Bundle-adjustment tests: LM convergence on synthetic graphs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cube_slam_wu_tpu.core.cuboid import Cuboid
from cube_slam_wu_tpu.core.se3 import SE3
from cube_slam_wu_tpu.slam import ba
from cube_slam_wu_tpu.slam.graph import CameraObjectGraph, graph_chi2


def _make_synthetic(F=8, n_active=6, noise=0.05, seed=0):
    """Ground-truth trajectory + cuboid; perfect odometry and cuboid
    measurements; initial estimates perturbed."""
    rng = np.random.default_rng(seed)
    # smooth trajectory: camera moves along x, looking forward
    t = np.linspace(0, 1, F)
    true_Twc = SE3.exp(
        jnp.asarray(
            np.stack(
                [0.1 * t, 0.05 * t, 0.2 * t, 1.0 * t, 0.2 * t, 0.1 * t], axis=1
            )
        )
    )
    true_Tcw = true_Twc.inverse()
    cube_true = Cuboid.from_minimal(
        jnp.asarray([0.5, 2.0, 0.3, 0.0, 0.0, 0.7, 0.4, 0.3, 0.3])
    )

    graph = CameraObjectGraph.empty(F, n_objects=1)
    # odometry measurements: exact relative transforms
    odom = []
    for i in range(F):
        if i == 0:
            odom.append(SE3.identity())
        else:
            odom.append(true_Tcw[i].compose(true_Tcw[i - 1].inverse()))
    odom = jax.tree.map(lambda *xs: jnp.stack(xs), *odom)

    # cuboid measurements in each camera frame (exact), object axis O = 1
    meas = cube_true.transform_to(true_Twc)
    meas = jax.tree.map(lambda x: x[:, None], meas)

    active = jnp.arange(F) < n_active
    # initial estimates: truth perturbed (frame 0 exact = fixed)
    pert = rng.normal(size=(F, 6)) * noise
    pert[0] = 0
    init_Tcw = SE3.exp(jnp.asarray(pert)).compose(true_Tcw)
    cube_init = cube_true.exp_update(jnp.asarray(rng.normal(size=9) * noise))
    cube_init = jax.tree.map(lambda x: x[None], cube_init)

    graph = graph._replace(
        cam_Tcw=init_Tcw,
        cube=cube_init,
        frame_mask=active,
        cube_valid=jnp.ones(1, bool),
        odom=odom,
        odom_mask=active & (jnp.arange(F) > 0),
        cube_meas=meas,
        cube_meas_weight=jnp.ones((F, 1)) * 1.8,
        cube_meas_mask=active[:, None],
    )
    return graph, true_Tcw, cube_true


@pytest.mark.slow
def test_lm_converges_to_truth():
    graph, true_Tcw, cube_true = _make_synthetic()
    chi2_init = float(graph_chi2(graph, graph.cam_Tcw, graph.cube))
    res = ba.optimize(graph, iterations=10)
    chi2_fin = float(res.chi2)
    assert chi2_fin < 1e-10, (chi2_init, chi2_fin)
    # poses converge to truth where active (up to gauge fixed by frame 0)
    err = np.asarray(res.cam_Tcw.compose(true_Tcw.inverse()).log())
    assert np.abs(err[:6]).max() < 1e-5
    cube_err = np.asarray(res.cube.log_error(cube_true))
    assert np.abs(cube_err).max() < 1e-5


def test_fixed_first_frame_does_not_move():
    graph, _, _ = _make_synthetic()
    before = jax.tree.map(np.asarray, graph.cam_Tcw[0])
    res = ba.optimize(graph, iterations=5)
    after = jax.tree.map(np.asarray, res.cam_Tcw[0])
    np.testing.assert_allclose(after.quat, before.quat, atol=1e-12)
    np.testing.assert_allclose(after.trans, before.trans, atol=1e-12)


def test_masked_frames_untouched():
    graph, _, _ = _make_synthetic(F=8, n_active=6)
    before = np.asarray(graph.cam_Tcw.trans[6:])
    res = ba.optimize(graph, iterations=5)
    after = np.asarray(res.cam_Tcw.trans[6:])
    np.testing.assert_allclose(after, before, atol=1e-9)


def test_chi2_monotone_overall():
    graph, _, _ = _make_synthetic(noise=0.2, seed=3)
    c0 = float(graph_chi2(graph, graph.cam_Tcw, graph.cube))
    res = ba.optimize(graph, iterations=5)
    assert float(res.chi2) < c0 * 0.01


@pytest.mark.slow
def test_noisy_measurements_still_converge():
    """With noisy odometry, LM should still reduce chi2 and stay finite."""
    graph, true_Tcw, _ = _make_synthetic(noise=0.1, seed=5)
    rng = np.random.default_rng(7)
    noisy_odom = SE3.exp(jnp.asarray(rng.normal(size=(8, 6)) * 0.01)).compose(graph.odom)
    graph = graph._replace(odom=noisy_odom)
    c0 = float(graph_chi2(graph, graph.cam_Tcw, graph.cube))
    res = ba.optimize(graph, iterations=8)
    assert np.isfinite(float(res.chi2))
    assert float(res.chi2) < c0


@pytest.mark.slow
def test_huber_tames_outlier_measurement():
    """A corrupted cuboid measurement drags plain LM; the Huber kernel caps
    its influence (g2o robust-kernel capability, shipped unused by the
    reference driver)."""
    graph, true_Tcw, _ = _make_synthetic(F=8, n_active=8, noise=0.02, seed=7)
    bad = Cuboid.from_minimal(jnp.asarray([3.0, -1.0, 1.5, 0, 0, 1.2, 0.9, 0.8, 0.7]))
    cm = graph.cube_meas
    cm = jax.tree.map(
        lambda full, b: full.at[4, 0].set(b), cm, bad
    )
    graph = graph._replace(cube_meas=cm)

    res_plain = ba.optimize(graph, iterations=8)
    res_huber = ba.optimize(graph, iterations=8, robust_delta=0.5)
    err_plain = np.abs(np.asarray(res_plain.cam_Tcw.compose(true_Tcw.inverse()).log())).max()
    err_huber = np.abs(np.asarray(res_huber.cam_Tcw.compose(true_Tcw.inverse()).log())).max()
    assert err_huber < err_plain * 0.7, (err_huber, err_plain)


def test_gauss_newton_converges_to_truth():
    """algorithm="gn" (optimization_algorithm_gauss_newton.cpp analogue):
    unconditional GN steps converge on the well-conditioned synthetic
    graph, and frame 0 / masked frames stay fixed."""
    graph, true_Tcw, cube_true = _make_synthetic()
    res = ba.optimize(graph, iterations=10, algorithm="gn")
    assert float(res.chi2) < 1e-10
    err = np.asarray(res.cam_Tcw.compose(true_Tcw.inverse()).log())
    assert np.abs(err[:6]).max() < 1e-5
    np.testing.assert_allclose(
        np.asarray(res.cam_Tcw.trans[0]),
        np.asarray(graph.cam_Tcw.trans[0]),
        atol=1e-12,
    )


def test_dogleg_converges_to_truth():
    """algorithm="dogleg" (optimization_algorithm_dogleg.cpp analogue):
    trust-region blend of GN and Cauchy steps; must reach the same optimum
    as LM and shrink chi2 monotonically in the accept sense."""
    graph, true_Tcw, cube_true = _make_synthetic(noise=0.15, seed=3)
    chi2_init = float(graph_chi2(graph, graph.cam_Tcw, graph.cube))
    res = ba.optimize(graph, iterations=15, algorithm="dogleg")
    assert float(res.chi2) < 1e-9, (chi2_init, float(res.chi2))
    err = np.asarray(res.cam_Tcw.compose(true_Tcw.inverse()).log())
    assert np.abs(err[:6]).max() < 1e-4
    # the three algorithms agree on the optimum
    res_lm = ba.optimize(graph, iterations=15)
    np.testing.assert_allclose(
        np.asarray(res.cam_Tcw.trans),
        np.asarray(res_lm.cam_Tcw.trans),
        atol=1e-6,
    )


def test_unknown_algorithm_rejected():
    graph, _, _ = _make_synthetic()
    with pytest.raises(ValueError):
        ba.optimize(graph, iterations=1, algorithm="adam")
