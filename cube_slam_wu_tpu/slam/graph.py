"""Fixed-capacity camera-object factor graph as a JAX pytree.

Replaces the reference's incrementally-grown g2o graph
(object_slam/src/main_obj.cpp:479-841) with a static-shape state: pose slots
for up to `capacity` frames and `n_objects` cuboid landmarks, gated by
boolean masks.  Growing the graph is a masked in-place update, so the whole
incremental-SLAM step stays inside one jit compilation.

The reference instantiates exactly ONE cuboid vertex ("in this example,
there is only one object!!!", main_obj.cpp:508); here the object axis is a
first-class batch dimension (O >= 1) — per-(frame, object) measurements with
masks, so multi-object scenes (KITTI) use the same compiled program.

Vertex/edge semantics follow the reference exactly:
- camera vertices store world-to-camera (Tcw) like g2o VertexSE3Expmap, with
  left-multiplicative exp updates (types_six_dof_expmap.h:75-77);
- cuboid vertices store object-to-world pose + half extents with
  right-multiplicative exp updates (g2o_Object.h:202-232);
- odometry edges: log(C * Tcw_prev * Tcw_curr^-1), identity information
  (types_six_dof_expmap.h:91-98, main_obj.cpp:784-800);
- camera-object edges: 9-d min_log_error between the global cuboid and the
  measurement transformed to world, information (2*quality)^2 I
  (g2o_Object.h:250-259, main_obj.cpp:762-782).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cube_slam_wu_tpu.core.cuboid import Cuboid
from cube_slam_wu_tpu.core.se3 import SE3


class CameraObjectGraph(NamedTuple):
    """State + measurements for up to F frames and O cuboid landmarks."""

    cam_Tcw: SE3  # (F,) world-to-camera estimates
    cube: Cuboid  # (O,) object-to-world estimates
    frame_mask: jnp.ndarray  # (F,) bool: frame slot active
    cube_valid: jnp.ndarray  # (O,) bool: cuboid vertex initialised
    odom: SE3  # (F,) measurement for edge (i-1 -> i), slot i
    odom_mask: jnp.ndarray  # (F,) bool (slot 0 unused)
    cube_meas: Cuboid  # (F, O) camera-frame cuboid measurements
    cube_meas_weight: jnp.ndarray  # (F, O) scalar sqrt-information (2*quality)
    cube_meas_mask: jnp.ndarray  # (F, O) bool
    # 2D projection edges (EdgeSE3CuboidProj, g2o_Object.h:264-292):
    # measured 2D bbox [cx, cy, w, h] per (frame, object), with intrinsics
    bbox_meas: jnp.ndarray  # (F, O, 4)
    bbox_weight: jnp.ndarray  # (F, O)
    bbox_mask: jnp.ndarray  # (F, O) bool
    K: jnp.ndarray  # (3, 3) intrinsics for the projection edges

    @staticmethod
    def empty(capacity: int, n_objects: int = 1, dtype=jnp.float64) -> "CameraObjectGraph":
        F, O = capacity, n_objects
        return CameraObjectGraph(
            cam_Tcw=SE3.identity((F,), dtype),
            cube=Cuboid.identity((O,), dtype),
            frame_mask=jnp.zeros((F,), bool),
            cube_valid=jnp.zeros((O,), bool),
            odom=SE3.identity((F,), dtype),
            odom_mask=jnp.zeros((F,), bool),
            cube_meas=Cuboid.identity((F, O), dtype),
            cube_meas_weight=jnp.zeros((F, O), dtype),
            cube_meas_mask=jnp.zeros((F, O), bool),
            bbox_meas=jnp.zeros((F, O, 4), dtype),
            bbox_weight=jnp.zeros((F, O), dtype),
            bbox_mask=jnp.zeros((F, O), bool),
            K=jnp.eye(3, dtype=dtype),
        )

    @property
    def capacity(self) -> int:
        return self.frame_mask.shape[0]

    @property
    def n_objects(self) -> int:
        return self.cube_valid.shape[0]

    def cam_Twc(self) -> SE3:
        return self.cam_Tcw.inverse()


def graph_residuals(graph: CameraObjectGraph, cam_Tcw: SE3, cube: Cuboid):
    """Stacked weighted residuals of all edges given candidate estimates.

    Returns (odom_res (F, 6), cube_res (F, O, 9)); masked rows are zero.
    """
    F = graph.capacity
    O = graph.n_objects
    prev = cam_Tcw[jnp.maximum(jnp.arange(F) - 1, 0)]
    # odom edge: log(C * Tcw_{i-1} * Tcw_i^{-1})
    err_pose = graph.odom.compose(prev).compose(cam_Tcw.inverse())
    odom_res = err_pose.log()
    odom_res = jnp.where(graph.odom_mask[:, None], odom_res, 0.0)

    # cam-object edges: global.min_log_error(meas.transform_from(Twc))
    Twc = cam_Tcw.inverse()
    Twc_b = SE3(
        jnp.broadcast_to(Twc.quat[:, None, :], (F, O, 4)),
        jnp.broadcast_to(Twc.trans[:, None, :], (F, O, 3)),
    )
    est_global = graph.cube_meas.transform_from(Twc_b)  # (F, O)
    cube_b = Cuboid(
        SE3(
            jnp.broadcast_to(cube.pose.quat[None, :, :], (F, O, 4)),
            jnp.broadcast_to(cube.pose.trans[None, :, :], (F, O, 3)),
        ),
        jnp.broadcast_to(cube.scale[None, :, :], (F, O, 3)),
    )
    cube_res = cube_b.min_log_error(est_global)  # (F, O, 9)
    w = graph.cube_meas_weight[..., None]
    active = (
        (graph.cube_meas_mask & graph.frame_mask[:, None])[..., None]
        & graph.cube_valid[None, :, None]
    )
    cube_res = jnp.where(active, w * cube_res, 0.0)

    # 2D projection edges: projected bbox [cx, cy, w, h] - measured
    # (EdgeSE3CuboidProj::computeError, g2o_Object.h:279-291)
    Tcw_b = SE3(
        jnp.broadcast_to(cam_Tcw.quat[:, None, :], (F, O, 4)),
        jnp.broadcast_to(cam_Tcw.trans[:, None, :], (F, O, 3)),
    )
    proj = cube_b.project_bbox(Tcw_b, graph.K)  # (F, O, 4)
    bbox_res = proj - graph.bbox_meas
    bactive = (
        (graph.bbox_mask & graph.frame_mask[:, None])[..., None]
        & graph.cube_valid[None, :, None]
    )
    bbox_res = jnp.where(
        bactive & jnp.isfinite(bbox_res),
        graph.bbox_weight[..., None] * bbox_res,
        0.0,
    )
    return odom_res, cube_res, bbox_res


def graph_chi2(graph: CameraObjectGraph, cam_Tcw: SE3, cube: Cuboid) -> jnp.ndarray:
    odom_res, cube_res, bbox_res = graph_residuals(graph, cam_Tcw, cube)
    return jnp.sum(odom_res**2) + jnp.sum(cube_res**2) + jnp.sum(bbox_res**2)
