import os, sys, time, math
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from cube_slam_wu_tpu.ops.proposal import detect_cuboid_single, ProposalConfig
from cube_slam_wu_tpu.utils import io as uio
from oracle_proposal import detect_cuboid_oracle

base = "/root/reference/detect_3d_cuboid/data/"
gray = jnp.asarray(uio.load_image_gray(base + "0000_rgb_raw.jpg"))
edges = uio.read_number_txt(base + "edge_detection/LSD/0000_edge.txt")
K = np.array([[529.5, 0, 365.0], [0, 529.5, 265.0], [0, 0, 1.0]])
T_wc = np.array([
    [1, 0.0011, 0.0004, 0],
    [0, -0.3376, 0.9413, 0],
    [0.0011, -0.9413, -0.3376, 1.35],
    [0, 0, 0, 1.0]])
bbox = np.array([187.0, 188.0, 201.0, 311.0])
L = 320
lines = np.zeros((L, 4)); lines[: len(edges)] = edges[:, :4]
mask = np.zeros(L, bool); mask[: len(edges)] = True
cfg = ProposalConfig(max_lines=L)
res, intern = detect_cuboid_single(gray, jnp.asarray(K), jnp.asarray(T_wc), jnp.asarray(bbox),
                                   jnp.asarray(lines), jnp.asarray(mask), cfg, return_internals=True)
intern = {k: np.asarray(v) for k, v in intern.items()}
res = jax.tree.map(np.asarray, res)

# oracle with SHARED dist_map + merged lines + same yaw samples
mlines = intern["merged_lines"][intern["merged_mask"]]
print("merged lines:", mlines.shape)
records, best = detect_cuboid_oracle(intern["dist_map"], mlines, K, T_wc, bbox, intern["yaws"])
print("oracle valid hypotheses:", len(records))
print("engine valid hypotheses:", intern["valid"].sum())

# map engine flat index -> (rp, yaw, top, cfg): strides
Y = len(intern["yaws"]); T = len(intern["top_xs"]); C = 2
def flat_idx(yaw_i, top_i, cfg_i):
    return (0 * Y + yaw_i) * T * C + top_i * C + cfg_i
# compare per-record
n_match = 0; max_dd = 0; max_da = 0
for r in records:
    yi = int(np.argmin(np.abs(intern["yaws"] - r["yaw"])))
    fi = flat_idx(yi, r["top_id"], r["config"] - 1)
    if not intern["valid"][fi]:
        print("MISSING in engine:", r["config"], r["top_id"], yi); continue
    n_match += 1
    max_dd = max(max_dd, abs(intern["dist"][fi] - r["dist"]))
    max_da = max(max_da, abs(intern["angle"][fi] - r["angle"]))
print(f"matched {n_match}/{len(records)}; max dist diff {max_dd:.2e}, max angle diff {max_da:.2e}")
extra = intern["valid"].sum() - n_match
print("engine extra valid:", extra)
print("oracle best:", {k: v for k, v in best.items() if k not in ("corners",)} if best else None)
print("engine best: pos", res.pos, "scale", res.scale, "rotY", res.rotY, "cfg", res.box_config_type,
      "norm", res.normalized_error, "skew", res.skew_ratio)
