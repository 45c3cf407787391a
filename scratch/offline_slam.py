import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
from cube_slam_wu_tpu.slam.pipeline import run_offline_slam
from cube_slam_wu_tpu.utils import io as uio
from cube_slam_wu_tpu.utils.metrics import ate_rmse

base = "/root/reference/object_slam/data/"
t0 = time.time()
out = run_offline_slam(base)
print(f"offline SLAM run: {time.time()-t0:.1f}s")
truth = uio.read_number_txt(base + "truth_cam_poses.txt")
ref_out = uio.read_number_txt(base + "output_cam_poses.txt")
est_xyz = out.traj_Twc_xyzq[:, :3]
print("our ATE (direct):", ate_rmse(est_xyz, truth[:, 1:4]))
print("ref ATE (direct):", ate_rmse(ref_out[:, 1:4], truth[:, 1:4]))
print("our ATE (aligned):", ate_rmse(est_xyz, truth[:, 1:4], align=True))
print("ref ATE (aligned):", ate_rmse(ref_out[:, 1:4], truth[:, 1:4], align=True))
print("our vs ref traj diff:", ate_rmse(est_xyz, ref_out[:, 1:4]))
print("final cube:", np.round(out.cube_minimal, 3))
ref_obj = uio.read_number_txt(base + "output_obj_poses.txt")
print("ref final cube:", ref_obj[-1])
print("chi2 head/tail:", out.chi2[:3], out.chi2[-3:])
