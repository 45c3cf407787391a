"""Stage-level comparison of our proposal engine vs the reference oracle dumps
(tests/data/ref_oracle, produced by tools/ref_oracle)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib
import numpy as np
import jax.numpy as jnp

from cube_slam_wu_tpu.ops.proposal import ProposalConfig, detect_cuboid_single
from cube_slam_wu_tpu.utils import io as uio

ORACLE = pathlib.Path("/root/repo/tests/data/ref_oracle")
FIXTURE = pathlib.Path("/root/reference/detect_3d_cuboid/data")

gray = jnp.asarray(uio.load_image_gray(FIXTURE / "0000_rgb_raw.jpg"))
edges = uio.read_number_txt(FIXTURE / "edge_detection/LSD/0000_edge.txt")
K = np.array([[529.5, 0, 365.0], [0, 529.5, 265.0], [0, 0, 1.0]])
T_wc = np.array([
    [1, 0.0011, 0.0004, 0],
    [0, -0.3376, 0.9413, 0],
    [0.0011, -0.9413, -0.3376, 1.35],
    [0, 0, 0, 1.0],
])
bbox = np.array([187.0, 188.0, 201.0, 311.0])
L = 320
lines = np.zeros((L, 4)); lines[: len(edges)] = edges[:, :4]
mask = np.zeros(L, bool); mask[: len(edges)] = True

cfg = ProposalConfig(max_lines=L)
res, intern = detect_cuboid_single(
    gray, jnp.asarray(K), jnp.asarray(T_wc), jnp.asarray(bbox),
    jnp.asarray(lines), jnp.asarray(mask), cfg, return_internals=True,
)
intern = {k: np.asarray(v) for k, v in intern.items()}
res = jax.tree.map(np.asarray, res)

roi = np.loadtxt(ORACLE / "roi.txt").astype(int)  # x y w h
x0, y0, w, h = roi
print("ROI:", roi, " (x1,y1 incl) =", x0 + w - 1, y0 + h - 1)

# ---- merged lines
ref_merged = np.loadtxt(ORACLE / "lines_merged.txt")
ours_merged = intern["merged_lines"][intern["merged_mask"]]
print(f"merged lines: ref {len(ref_merged)} ours {len(ours_merged)}")
# match rows by nearest endpoints
used = set()
worst = 0.0
unmatched = []
for r in ref_merged:
    d = np.abs(ours_merged - r).max(axis=1)
    i = int(np.argmin(d))
    if d[i] < 3.0:
        used.add(i); worst = max(worst, d[i])
    else:
        unmatched.append((r, d[i]))
print(f"  matched {len(ref_merged)-len(unmatched)}/{len(ref_merged)} within 3px, worst {worst:.3f}")
for r, d in unmatched[:10]:
    print("  unmatched ref line:", r, "best diff", d)
extra = [i for i in range(len(ours_merged)) if i not in used]
for i in extra[:10]:
    print("  extra ours line:", ours_merged[i])

# ---- canny
ref_canny = np.loadtxt(ORACLE / "canny.txt") > 0  # (h, w) ROI coords
ours_canny_full = intern.get("canny")
if ours_canny_full is None:
    from cube_slam_wu_tpu.ops import image as oimg
    buf = oimg.replicate_roi(gray, x0, y0, x0 + w - 1, y0 + h - 1)
    ours_canny_full = np.asarray(oimg.canny(buf))
ours_canny = ours_canny_full[y0 : y0 + h, x0 : x0 + w]
agree = (ref_canny == ours_canny).mean()
print(f"canny: shape ref {ref_canny.shape} ours {ours_canny.shape}; agreement {agree:.4f}")
print(f"  ref edge px {ref_canny.sum()}, ours {ours_canny.sum()}, both {np.logical_and(ref_canny, ours_canny).sum()}")

# ---- dist map
ref_dist = np.loadtxt(ORACLE / "dist_map.txt")
ours_dist = intern["dist_map"][y0 : y0 + h, x0 : x0 + w]
diff = np.abs(ref_dist - ours_dist)
print(f"dist map: mean |diff| {diff.mean():.4f}, max {diff.max():.4f}, rel-at-5px {np.abs(diff[(ref_dist<5)]).mean():.4f}")

# ---- winner + ranked list
ref_props = np.loadtxt(ORACLE / "proposals.txt")
print("ref winner:", ref_props[0, :9])
print("our winner:", res.pos, res.scale, res.rotY, res.box_config_type)
print("ref top-5 normalized_err:", ref_props[:5, 11])
