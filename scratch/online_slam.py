import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
from cube_slam_wu_tpu.slam.pipeline import run_online_slam
from cube_slam_wu_tpu.utils import io as uio
from cube_slam_wu_tpu.utils.metrics import ate_rmse

base = "/root/reference/object_slam/data/"
t0 = time.time()
out = run_online_slam(base)
print(f"online SLAM: {time.time()-t0:.0f}s")
truth = uio.read_number_txt(base + "truth_cam_poses.txt")
ref_out = uio.read_number_txt(base + "output_cam_poses.txt")
est = out.traj_Twc_xyzq[:, :3]
print(f"ATE direct  ours={ate_rmse(est, truth[:,1:4]):.4f} ref={ate_rmse(ref_out[:,1:4], truth[:,1:4]):.4f}")
print(f"ATE aligned ours={ate_rmse(est, truth[:,1:4], align=True):.4f} ref={ate_rmse(ref_out[:,1:4], truth[:,1:4], align=True):.4f}")
print("final cube:", np.round(out.cube_minimal, 3))
