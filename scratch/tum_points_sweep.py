"""Does windowed joint point BA help the TUM online run?

Round-1 negative result: the post-hoc point *refinement* polish worsened
ATE (0.234 -> 0.238).  Round 2 built a different mechanism — joint
camera+cuboid+point factors inside the fixed-lag window (the configuration
that carries the KITTI artifact).  This sweep measures it on the bundled
58-frame TUM sequence.
"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from cube_slam_wu_tpu.slam.pipeline import run_online_slam
from cube_slam_wu_tpu.utils import io as uio
from cube_slam_wu_tpu.utils.metrics import ate_rmse

BASE = "/root/reference/object_slam/data/"
truth = uio.read_number_txt(BASE + "truth_cam_poses.txt")

for pw in [float(x) for x in sys.argv[1:]] or [0.0, 0.1, 0.3]:
    r = run_online_slam(
        BASE, bbox_edge_weight=0.005, soft_gate_alpha=1.0, window=20,
        point_weight=pw, n_points=96,
    )
    est = r.traj_Twc_xyzq[:, :3]
    print(
        f"RESULT window=20 bbw=0.005 a=1 pw={pw} "
        f"ate={ate_rmse(est, truth[:, 1:4]):.4f} "
        f"aligned={ate_rmse(est, truth[:, 1:4], align=True):.4f}",
        flush=True,
    )
