"""cube_slam_wu_tpu — TPU-native monocular 3D object SLAM.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of CubeSLAM
(reference: wuxiaolang/Cube_SLAM_wu, an annotated fork of shichaoy/cube_slam):

- vanishing-point based cuboid proposal generation over a batched hypothesis
  grid (camera roll/pitch x object yaw x top-edge samples x configurations),
  scored with chamfer edge distance + VP angle alignment
  (reference: detect_3d_cuboid/src/box_proposal_detail.cpp),
- line-segment detection, LBD band descriptors and Hamming matching as
  vectorized tensor ops (reference: line_lbd/),
- a joint camera-object Levenberg-Marquardt bundle adjuster with 9-DoF cuboid
  landmarks replacing the bundled g2o (reference: object_slam/),
- multi-chip scaling via `jax.sharding` meshes with per-block Hessian
  reductions over ICI collectives.

Everything in the compute path is fixed-shape, mask-based, jit-compiled JAX;
variable-count entities (lines, proposals, frames) are padded arrays with
validity masks.
"""

__version__ = "0.1.0"

from cube_slam_wu_tpu.core import se3 as se3
from cube_slam_wu_tpu.core import cuboid as cuboid
from cube_slam_wu_tpu.core import rotations as rotations
