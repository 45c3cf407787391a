"""Fixed-capacity camera-object factor graph as a JAX pytree.

Replaces the reference's incrementally-grown g2o graph
(object_slam/src/main_obj.cpp:479-841) with a static-shape state: pose and
measurement slots for up to `capacity` frames plus one cuboid landmark,
gated by boolean masks.  Growing the graph is a masked in-place update, so
the whole incremental-SLAM step stays inside one jit compilation.

Vertex/edge semantics follow the reference exactly:
- camera vertices store world-to-camera (Tcw) like g2o VertexSE3Expmap, with
  left-multiplicative exp updates (types_six_dof_expmap.h:75-77);
- the cuboid vertex stores object-to-world pose + half extents with
  right-multiplicative exp updates (g2o_Object.h:202-232);
- odometry edges: log(C * Tcw_prev * Tcw_curr^-1), identity information
  (types_six_dof_expmap.h:91-98, main_obj.cpp:784-800);
- camera-object edges: 9-d min_log_error between the global cuboid and the
  measurement transformed to world, information (2*quality)^2 I
  (g2o_Object.h:250-259, main_obj.cpp:762-782).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cube_slam_wu_tpu.core.cuboid import Cuboid
from cube_slam_wu_tpu.core.se3 import SE3


class CameraObjectGraph(NamedTuple):
    """State + measurements for up to F frames and one cuboid landmark."""

    cam_Tcw: SE3  # (F,) world-to-camera estimates
    cube: Cuboid  # ()  object-to-world estimate
    frame_mask: jnp.ndarray  # (F,) bool: frame slot active
    cube_valid: jnp.ndarray  # () bool: cuboid vertex initialised
    odom: SE3  # (F,) measurement for edge (i-1 -> i), slot i
    odom_mask: jnp.ndarray  # (F,) bool (slot 0 unused)
    cube_meas: Cuboid  # (F,) camera-frame cuboid measurement
    cube_meas_weight: jnp.ndarray  # (F,) scalar sqrt-information (2*quality)
    cube_meas_mask: jnp.ndarray  # (F,) bool

    @staticmethod
    def empty(capacity: int, dtype=jnp.float64) -> "CameraObjectGraph":
        F = capacity
        return CameraObjectGraph(
            cam_Tcw=SE3.identity((F,), dtype),
            cube=Cuboid.identity((), dtype),
            frame_mask=jnp.zeros((F,), bool),
            cube_valid=jnp.asarray(False),
            odom=SE3.identity((F,), dtype),
            odom_mask=jnp.zeros((F,), bool),
            cube_meas=Cuboid.identity((F,), dtype),
            cube_meas_weight=jnp.zeros((F,), dtype),
            cube_meas_mask=jnp.zeros((F,), bool),
        )

    @property
    def capacity(self) -> int:
        return self.frame_mask.shape[0]

    def cam_Twc(self) -> SE3:
        return self.cam_Tcw.inverse()


def graph_residuals(graph: CameraObjectGraph, cam_Tcw: SE3, cube: Cuboid):
    """Stacked weighted residuals of all edges given candidate estimates.

    Returns (odom_res (F, 6), cube_res (F, 9)); masked rows are zero.
    """
    F = graph.capacity
    prev = cam_Tcw[jnp.maximum(jnp.arange(F) - 1, 0)]
    # odom edge: log(C * Tcw_{i-1} * Tcw_i^{-1})
    err_pose = graph.odom.compose(prev).compose(cam_Tcw.inverse())
    odom_res = err_pose.log()
    odom_res = jnp.where(graph.odom_mask[:, None], odom_res, 0.0)

    # cam-object edge: global.min_log_error(meas.transform_from(Twc))
    Twc = cam_Tcw.inverse()
    est_global = graph.cube_meas.transform_from(Twc)
    cube_b = Cuboid(
        SE3(
            jnp.broadcast_to(cube.pose.quat, (F, 4)),
            jnp.broadcast_to(cube.pose.trans, (F, 3)),
        ),
        jnp.broadcast_to(cube.scale, (F, 3)),
    )
    cube_res = cube_b.min_log_error(est_global)
    w = graph.cube_meas_weight[:, None]
    active = (graph.cube_meas_mask & graph.frame_mask)[:, None] & graph.cube_valid
    cube_res = jnp.where(active, w * cube_res, 0.0)
    return odom_res, cube_res


def graph_chi2(graph: CameraObjectGraph, cam_Tcw: SE3, cube: Cuboid) -> jnp.ndarray:
    odom_res, cube_res = graph_residuals(graph, cam_Tcw, cube)
    return jnp.sum(odom_res**2) + jnp.sum(cube_res**2)
