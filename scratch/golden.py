import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from cube_slam_wu_tpu.ops.proposal import detect_cuboid_single, ProposalConfig
from cube_slam_wu_tpu.utils import io as uio

base = "/root/reference/detect_3d_cuboid/data/"
gray = jnp.asarray(uio.load_image_gray(base + "0000_rgb_raw.jpg"))
edges = uio.read_number_txt(base + "edge_detection/LSD/0000_edge.txt")
K = jnp.asarray([[529.5, 0, 365.0], [0, 529.5, 265.0], [0, 0, 1.0]])
T_wc = jnp.asarray([
    [1, 0.0011, 0.0004, 0],
    [0, -0.3376, 0.9413, 0],
    [0.0011, -0.9413, -0.3376, 1.35],
    [0, 0, 0, 1.0]])
bbox = jnp.asarray([187.0, 188.0, 201.0, 311.0])
L = 320
lines = np.zeros((L, 4)); lines[: len(edges)] = edges[:, :4]
mask = np.zeros(L, bool); mask[: len(edges)] = True
cfg = ProposalConfig(max_lines=L)
t0 = time.time()
res = detect_cuboid_single(gray, K, T_wc, bbox, jnp.asarray(lines), jnp.asarray(mask), cfg)
res = jax.tree.map(lambda x: np.asarray(x), res)
print("compile+run", time.time() - t0)
print("valid", res.valid)
print("pos  ", res.pos, " expect [-1.58339 0.373187 0.300602]")
print("scale", res.scale, " expect [0.155737 0.436576 0.300602]")
print("rotY ", res.rotY, " expect -2.90009")
print("config", res.box_config_type, " expect [1 1]")
print("corners2d\n", res.corners_2d.astype(int))
print("expect\n[[503 279 213 430 559 261 174 459]\n [245 396 319 200  56 184 116  23]]")
print("dist_err", res.edge_distance_error, "angle_err", res.edge_angle_error, "norm", res.normalized_error, "skew", res.skew_ratio)
