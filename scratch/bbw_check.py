import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from cube_slam_wu_tpu.slam.pipeline import run_online_slam
from cube_slam_wu_tpu.utils import io as uio
from cube_slam_wu_tpu.utils.metrics import ate_rmse

mode = sys.argv[1]
BASE = "/root/reference/object_slam/data/"
truth = uio.read_number_txt(BASE + "truth_cam_poses.txt")
kw = dict(bbox_edge_weight=0.005)
if mode == "f32":
    kw["dtype"] = jnp.float32
elif mode == "w004":
    kw["bbox_edge_weight"] = 0.004
elif mode.startswith("alpha"):
    kw["soft_gate_alpha"] = float(mode[5:]) if mode[5:] != "none" else None
r = run_online_slam(BASE, **kw)
est = r.traj_Twc_xyzq[:, :3]
print(f"RESULT {mode} ate={ate_rmse(est, truth[:,1:4]):.4f} aligned={ate_rmse(est, truth[:,1:4], align=True):.4f}", flush=True)
