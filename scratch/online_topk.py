import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
from cube_slam_wu_tpu.slam.pipeline import run_online_slam
from cube_slam_wu_tpu.utils import io as uio
from cube_slam_wu_tpu.utils.metrics import ate_rmse

base = "/root/reference/object_slam/data/"
truth = uio.read_number_txt(base + "truth_cam_poses.txt")
for k in (3, 5):
    out = run_online_slam(base, proposal_overrides=dict(nominal_skew_ratio=2.0, average_top_k=k))
    est = out.traj_Twc_xyzq[:, :3]
    print(f"top-{k} avg: ATE {ate_rmse(est, truth[:,1:4]):.4f} aligned {ate_rmse(est, truth[:,1:4],align=True):.4f} "
          f"(ref 0.2205/0.1704; top-1 0.2344/0.1856)", flush=True)
