import os, sys, pathlib
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from cube_slam_wu_tpu.slam import tracker
from cube_slam_wu_tpu.slam.pipeline import _point_refinement
from cube_slam_wu_tpu.core.se3 import SE3
from cube_slam_wu_tpu.core.cuboid import Cuboid
from cube_slam_wu_tpu.utils import io as uio
from cube_slam_wu_tpu.utils.metrics import ate_rmse

base = pathlib.Path("/root/reference/object_slam/data/")
z = np.load("/root/repo/scratch/online_meas.npz")
meas9, quality, has = z["meas9"], z["quality"], z["has"]
truth = uio.read_number_txt(base / "truth_cam_poses.txt")
first = SE3.from_xyzq(jnp.asarray(truth[0,1:8]))
fr = tracker.FrameInput(meas=Cuboid.from_minimal(jnp.asarray(meas9[:, None, :])),
    quality=jnp.asarray(quality[:, None]), has_meas=jnp.asarray(has[:, None]),
    active=jnp.ones(len(quality), bool))
graph, _ = tracker.run_incremental(first, fr, soft_gate_alpha=2.0)
est0 = np.asarray(graph.cam_Twc().to_xyzq())[:, :3]
print(f"before points: ATE {ate_rmse(est0, truth[:,1:4]):.4f} aligned {ate_rmse(est0, truth[:,1:4], align=True):.4f}")
K = jnp.asarray([[535.4, 0, 320.1], [0, 539.2, 247.6], [0, 0, 1.0]])
g2 = _point_refinement(graph, base, len(quality), K, jnp.float64)
est1 = np.asarray(g2.cam_Twc().to_xyzq())[:, :3]
print(f"after points:  ATE {ate_rmse(est1, truth[:,1:4]):.4f} aligned {ate_rmse(est1, truth[:,1:4], align=True):.4f}")
print("ref:           ATE 0.2205 aligned 0.1704")
