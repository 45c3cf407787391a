"""Distributed BA on the virtual 8-device CPU mesh: must match single-chip."""

import jax
import numpy as np
import pytest

from cube_slam_wu_tpu.parallel import sharded_ba
from cube_slam_wu_tpu.slam import ba
from test_ba import _make_synthetic


@pytest.mark.parametrize(
    "n_devices",
    [2, pytest.param(4, marks=pytest.mark.slow), pytest.param(8, marks=pytest.mark.slow)],
)
def test_sharded_matches_single_chip(n_devices):
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough virtual devices")
    graph, _, _ = _make_synthetic(F=8, n_active=8, noise=0.1, seed=2)
    mesh = sharded_ba.make_mesh(n_devices)
    opt = sharded_ba.make_sharded_optimize(mesh, iterations=5)
    g_rep = sharded_ba.replicate_to_mesh(graph, mesh)
    res_sharded = opt(g_rep)
    res_single = ba.optimize(graph, iterations=5)
    np.testing.assert_allclose(
        np.asarray(res_sharded.chi2), np.asarray(res_single.chi2), rtol=1e-6, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(res_sharded.cam_Tcw.trans),
        np.asarray(res_single.cam_Tcw.trans),
        atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(res_sharded.cube.scale), np.asarray(res_single.cube.scale), atol=1e-8
    )


@pytest.mark.slow
def test_sharded_converges():
    mesh = sharded_ba.make_mesh(4)
    graph, true_Tcw, _ = _make_synthetic(F=8, n_active=8, noise=0.05, seed=0)
    opt = sharded_ba.make_sharded_optimize(mesh, iterations=10)
    res = opt(sharded_ba.replicate_to_mesh(graph, mesh))
    assert float(res.chi2) < 1e-9
    err = np.asarray(res.cam_Tcw.compose(true_Tcw.inverse()).log())
    assert np.abs(err).max() < 1e-4
