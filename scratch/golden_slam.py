import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from cube_slam_wu_tpu.ops.detect import detect_line_segments, DetectConfig
from cube_slam_wu_tpu.ops.proposal import detect_cuboid_single, ProposalConfig
from cube_slam_wu_tpu.core.se3 import SE3
from cube_slam_wu_tpu.utils import io as uio

base = "/root/reference/object_slam/data/"
gray = jnp.asarray(uio.load_image_gray(base + "raw_imgs/0000_rgb_raw.jpg"))
truth = uio.read_number_txt(base + "truth_cam_poses.txt")
T_wc = SE3.from_xyzq(jnp.asarray(truth[0, 1:8])).matrix()
K = jnp.asarray([[535.4, 0, 320.1], [0, 539.2, 247.6], [0, 0, 1.0]])
yolo = uio.read_number_txt(base + "filter_2d_obj_txts/0000_yolo2_0.15.txt")[0]
bbox = jnp.asarray([yolo[0]-1, yolo[1]-1, yolo[2], yolo[3]])
print("bbox:", bbox)

t0=time.time()
lines, mask = detect_line_segments(gray, DetectConfig())
print(f"detect: {time.time()-t0:.1f}s, {int(np.asarray(mask).sum())} lines")

cfg = ProposalConfig(max_lines=int(lines.shape[0]), nominal_skew_ratio=2.0)
t0=time.time()
res = detect_cuboid_single(gray, K, T_wc, bbox, lines, mask, cfg)
res = jax.tree.map(np.asarray, res)
print(f"proposal: {time.time()-t0:.1f}s")
print("valid:", res.valid)
print("pos  ", np.round(res.pos,3), " expect [-1.583  0.373  0.301]")
print("scale", np.round(res.scale,3), " expect [0.156 0.437 0.301]")
print("rotY ", round(float(res.rotY),3), " expect -2.900")
print("config", res.box_config_type, " expect [1 1]")
print("corners2d\n", res.corners_2d.astype(int))
print("expect\n[[503 279 213 430 559 261 174 459]\n [245 396 319 200  56 184 116  23]]")
