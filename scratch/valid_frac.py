import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from cube_slam_wu_tpu.ops.proposal import ProposalConfig, detect_cuboid_single
from cube_slam_wu_tpu.ops.detect import DetectConfig, detect_line_segments
from cube_slam_wu_tpu.utils import io as uio

# demo fixture
base = "/root/reference/detect_3d_cuboid/data/"
gray = jnp.asarray(uio.load_image_gray(base + "0000_rgb_raw.jpg"))
edges = uio.read_number_txt(base + "edge_detection/LSD/0000_edge.txt")
L = 320
lines = np.zeros((L, 4)); lines[: len(edges)] = edges[:, :4]
mask = np.zeros(L, bool); mask[: len(edges)] = True
K = jnp.asarray([[529.5, 0, 365.0], [0, 529.5, 265.0], [0, 0, 1.0]])
T_wc = jnp.asarray([[1.0,0,0,0],[0,0,1,0],[0,-1,0,1.0],[0,0,0,1.0]])
bbox = jnp.asarray([187.0, 188.0, 14.0, 123.0])
cfg = ProposalConfig(max_lines=L, sample_cam_roll_pitch=True)
res, internals = detect_cuboid_single(gray, K, T_wc, bbox, jnp.asarray(lines), jnp.asarray(mask), cfg, return_internals=True)
v = np.asarray(internals["valid"])
print(f"demo: valid {v.sum()}/{v.size} = {v.mean():.3f}")

# TUM online frames
tum = "/root/reference/object_slam/data/"
K2 = jnp.asarray([[535.4,0,320.1],[0,539.2,247.6],[0,0,1.0]])
truth = uio.read_number_txt(tum + "truth_cam_poses.txt")
from cube_slam_wu_tpu.core.se3 import SE3
first = SE3.from_xyzq(jnp.asarray(truth[0,1:8])).matrix()
dcfg = DetectConfig()
for fi in [0, 5, 10, 30, 45, 57]:
    g = jnp.asarray(uio.load_image_gray(tum + f"raw_imgs/{fi:04d}_rgb_raw.jpg"))
    det = uio.read_number_txt(tum + f"filter_2d_obj_txts/{fi:04d}_yolo2_0.15.txt")
    if det.size == 0:
        print(f"tum frame {fi}: no detections"); continue
    det = det.reshape(-1, det.shape[-1])
    ls, lm = detect_line_segments(g.astype(jnp.float32), dcfg)
    cfg2 = ProposalConfig(max_lines=int(ls.shape[0]), sample_cam_roll_pitch=(fi != 0))
    bb = jnp.asarray(det[0, :4], jnp.float64)
    r2, itn = detect_cuboid_single(g, K2, first, bb, ls.astype(jnp.float64), lm, cfg2, return_internals=True)
    v2 = np.asarray(itn["valid"])
    print(f"tum frame {fi}: valid {v2.sum()}/{v2.size} = {v2.mean():.3f}  (per-block max over 6 blocks: ", end="")
    nb = 6 if cfg2.sample_bbox_height else 2
    per = v2.reshape(nb, -1) if v2.size % nb == 0 else None
    if per is not None:
        print([int(x) for x in per.sum(1)], ")")
    else:
        print("n/a )")
