"""2D projection edge tests (EdgeSE3CuboidProj, g2o_Object.h:264-292)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cube_slam_wu_tpu.core.cuboid import Cuboid
from cube_slam_wu_tpu.slam import ba
from cube_slam_wu_tpu.slam.graph import graph_chi2, graph_residuals
from test_ba import _make_synthetic

K = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1.0]])


def _with_bbox_edges(noise=0.05, seed=0, weight=0.05):
    graph, true_Tcw, _ = _make_synthetic(F=6, n_active=6, noise=noise, seed=seed)
    F = graph.capacity
    # cuboid well in front of the (near-identity) cameras so every frame's
    # projection is finite
    cube_true = Cuboid.from_minimal(
        jnp.asarray([0.3, 0.2, 6.0, 0.0, 0.0, 0.4, 0.5, 0.4, 0.45])
    )
    meas = cube_true.transform_to(true_Tcw.inverse())
    meas = jax.tree.map(lambda x: x[:, None], meas)
    rng = np.random.default_rng(seed + 50)
    cube_init = cube_true.exp_update(jnp.asarray(rng.normal(size=9) * noise))
    graph = graph._replace(
        cube=jax.tree.map(lambda x: x[None], cube_init),
        cube_meas=meas,
    )
    # exact projected bboxes of the true cuboid from the true poses
    proj = jax.vmap(lambda T: cube_true.project_bbox(T, K))(true_Tcw)  # (F, 4)
    graph = graph._replace(
        bbox_meas=proj[:, None, :],
        bbox_weight=jnp.full((F, 1), weight),
        bbox_mask=jnp.ones((F, 1), bool),
        K=K,
    )
    return graph, true_Tcw, cube_true


def test_bbox_residual_zero_at_truth():
    graph, true_Tcw, cube_true = _with_bbox_edges(noise=0.0)
    cube_batched = Cuboid(
        jax.tree.map(lambda x: x[None], cube_true.pose), cube_true.scale[None]
    )
    _, _, bbox_res = graph_residuals(graph, true_Tcw, cube_batched)
    np.testing.assert_allclose(np.asarray(bbox_res), 0.0, atol=1e-8)


@pytest.mark.slow
def test_bbox_edges_reduce_chi2():
    graph, _, _ = _with_bbox_edges(noise=0.08, seed=2)
    c0 = float(graph_chi2(graph, graph.cam_Tcw, graph.cube))
    res = ba.optimize(graph, iterations=8)
    assert np.isfinite(float(res.chi2))
    assert float(res.chi2) < c0 * 0.05, (c0, float(res.chi2))


def test_bbox_edges_improve_projection_consistency():
    """With projection edges on, the optimized cuboid reprojects closer to
    the measured boxes than without them."""
    graph, true_Tcw, cube_true = _with_bbox_edges(noise=0.08, seed=3, weight=0.1)
    no_bbox = graph._replace(bbox_mask=jnp.zeros_like(graph.bbox_mask))

    def reproj_err(result):
        cube0 = Cuboid(result.cube.pose[0], result.cube.scale[0])
        proj = jax.vmap(lambda T: cube0.project_bbox(T, K))(result.cam_Tcw)
        return float(jnp.mean(jnp.abs(proj - graph.bbox_meas[:, 0, :])))

    with_e = reproj_err(ba.optimize(graph, iterations=8))
    without_e = reproj_err(ba.optimize(no_bbox, iterations=8))
    assert with_e <= without_e + 1e-6, (with_e, without_e)
