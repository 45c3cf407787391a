"""Experiment: add 2D bbox projection edges (from yolo txts) to OFFLINE mode
and sweep the weight (online won 0.2353->0.1789 with w=0.005)."""
import os, sys
import jax
os.environ["JAX_PLATFORMS"] = "cpu"
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp
from cube_slam_wu_tpu.slam import pipeline, tracker
from cube_slam_wu_tpu.core.se3 import SE3
from cube_slam_wu_tpu.utils import io as uio
from cube_slam_wu_tpu.utils.metrics import ate_rmse

BASE = "/root/reference/object_slam/data"
data = pipeline.load_offline_dataset(BASE)
frames = pipeline.build_offline_frames(data)
n = data.truth_poses.shape[0]
K = np.array([[535.4, 0, 320.1], [0, 539.2, 247.6], [0, 0, 1.0]])

bbox = np.zeros((n, 1, 4))
bw = np.zeros((n, 1))
for i in range(n):
    p = f"{BASE}/filter_2d_obj_txts/{i:04d}_yolo2_0.15.txt"
    if not os.path.exists(p):
        continue
    b, c, m = uio.read_detections_txt(p, n_max=1)
    if not np.asarray(m).any():
        continue
    b = np.asarray(b)[0]  # corner form x1 y1 x2 y2
    x1, y1, x2, y2 = b[0]-1, b[1]-1, b[2]-1, b[3]-1
    bbox[i, 0] = [(x1+x2)/2, (y1+y2)/2, x2-x1, y2-y1]
    bw[i, 0] = 1.0

first = SE3.from_xyzq(jnp.asarray(data.truth_poses[0, 1:8], jnp.float64))
for w in (0.0, 0.002, 0.005, 0.01):
    fr = frames._replace(bbox=jnp.asarray(bbox), bbox_weight=jnp.asarray(bw * w))
    g, _, _ = tracker.run_incremental(first, fr, K=jnp.asarray(K))
    traj = np.asarray(g.cam_Twc().to_xyzq())
    print(f"w={w}: offline ATE {ate_rmse(traj[:n,:3], data.truth_poses[:,1:4]):.4f}")
