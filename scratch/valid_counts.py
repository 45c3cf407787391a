"""Measure per-config n_valid across the 58-frame online run with caps
disabled, to size dist_gather_cap (overflow silently invalidates)."""
import os, sys
import jax
os.environ["JAX_PLATFORMS"] = "cpu"
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp
from cube_slam_wu_tpu.ops.detect import DetectConfig, detect_line_segments
from cube_slam_wu_tpu.ops.proposal import ProposalConfig, detect_cuboid_single
from cube_slam_wu_tpu.utils import io as uio
from cube_slam_wu_tpu.core.se3 import SE3

BASE = "/root/reference/object_slam/data"
truth = uio.read_number_txt(f"{BASE}/truth_cam_poses.txt")
K = jnp.asarray([[535.4, 0, 320.1], [0, 539.2, 247.6], [0, 0, 1.0]], jnp.float64)
T0 = jnp.asarray(SE3.from_xyzq(jnp.asarray(truth[0][1:], jnp.float64)).matrix())
det_cfg = DetectConfig()
mx = {1: [], 2: []}
for i in range(58):
    g = jnp.asarray(uio.load_image_gray(f"{BASE}/raw_imgs/{i:04d}_rgb_raw.jpg"))
    b, c, m = uio.read_detections_txt(f"{BASE}/filter_2d_obj_txts/{i:04d}_yolo2_0.15.txt", n_max=1)
    if not np.asarray(m).any():
        continue
    b = np.asarray(b)[0]
    bbox = jnp.asarray([b[0]-1, b[1]-1, b[2]-b[0], b[3]-b[1]], jnp.float64)
    lines32, lmask = detect_line_segments(g.astype(jnp.float32), det_cfg)
    cfg = ProposalConfig(max_lines=int(lines32.shape[0]),
                         sample_cam_roll_pitch=(i != 0),
                         nominal_skew_ratio=2.0, rank_margin=2e-3,
                         bilinear_dist=True,
                         dist_gather_cap=0, dist_gather_cap2=0)
    res, intern = detect_cuboid_single(g, K, T0, bbox, lines32.astype(jnp.float64),
                                       lmask, cfg, return_internals=True)
    v = np.asarray(intern["valid"]); cid = np.asarray(intern["cfg_id"])
    for k in (1, 2):
        mx[k].append(int((v & (cid == k)).sum()))
for k in (1, 2):
    a = np.asarray(mx[k])
    print(f"config {k}: max {a.max()} p95 {np.percentile(a,95):.0f} mean {a.mean():.0f} (caps now 5120/2048)")
