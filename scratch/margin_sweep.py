"""Sweep rank_margin (bilinear on) for the full 58-frame online run, in
f64 and f32, reporting ATE and the f32/f64 divergence.

Usage: python scratch/margin_sweep.py <margin> <dtype:f32|f64>
Prints one line: margin dtype ate ate_aligned
"""
import os, sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

margin = float(sys.argv[1])
use64 = sys.argv[2] == "f64"
jax.config.update("jax_enable_x64", use64)

import numpy as np

from cube_slam_wu_tpu.slam.pipeline import run_online_slam
from cube_slam_wu_tpu.utils import io as uio
from cube_slam_wu_tpu.utils.metrics import ate_rmse

BASE = "/root/reference/object_slam/data/"
truth = uio.read_number_txt(BASE + "truth_cam_poses.txt")
result = run_online_slam(
    BASE, proposal_overrides={"rank_margin": margin, "bilinear_dist": True}
)
est = result.traj_Twc_xyzq[:, :3]
ate = ate_rmse(est, truth[:, 1:4])
atea = ate_rmse(est, truth[:, 1:4], align=True)
np.save(
    f"/root/repo/scratch/sweep_m{margin:g}_{sys.argv[2]}.npy", est
)
print(f"RESULT margin={margin:g} dtype={sys.argv[2]} ate={ate:.4f} aligned={atea:.4f}", flush=True)
