import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from cube_slam_wu_tpu.slam import tracker
from cube_slam_wu_tpu.core.se3 import SE3
from cube_slam_wu_tpu.core.cuboid import Cuboid
from cube_slam_wu_tpu.utils import io as uio
from cube_slam_wu_tpu.utils.metrics import ate_rmse

base = "/root/reference/object_slam/data/"
z = np.load("/root/repo/scratch/online_meas.npz")
meas9, quality, has = z["meas9"], z["quality"], z["has"]
truth = uio.read_number_txt(base + "truth_cam_poses.txt")
first = SE3.from_xyzq(jnp.asarray(truth[0,1:8]))
fr = tracker.FrameInput(meas=Cuboid.from_minimal(jnp.asarray(meas9)),
    quality=jnp.asarray(quality), has_meas=jnp.asarray(has), active=jnp.ones(len(quality),bool))
for a in (2.0, 4.0, 6.0, 10.0):
    g, _ = tracker.run_incremental(first, fr, soft_gate_alpha=a)
    est = np.asarray(g.cam_Twc().to_xyzq())[:,:3]
    print(f"alpha {a}: ATE {ate_rmse(est, truth[:,1:4]):.4f} aligned {ate_rmse(est, truth[:,1:4],align=True):.4f}")
