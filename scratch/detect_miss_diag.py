"""Diagnose which LSD-fixture segments the detector misses and why."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp
import math

from cube_slam_wu_tpu.ops.detect import DetectConfig, detect_line_segments
from cube_slam_wu_tpu.ops import image as image_ops
from cube_slam_wu_tpu.ops.detect import gaussian_blur5
from cube_slam_wu_tpu.utils import io as uio

base = "/root/reference/detect_3d_cuboid/data"
gray = uio.load_image_gray(f"{base}/0000_rgb_raw.jpg")
ref = uio.read_number_txt(f"{base}/edge_detection/LSD/0000_edge.txt")


def _match(l, r, perp_tol=4.0, ov_min=0.5, ang_tol=0.15):
    qa, qb = r[:2], r[2:]
    d = qb - qa
    L = np.linalg.norm(d) + 1e-9
    n = np.array([-d[1], d[0]]) / L
    perp = max(abs((l[:2] - qa) @ n), abs((l[2:] - qa) @ n))
    ta, tb = (l[:2] - qa) @ d / L**2, (l[2:] - qa) @ d / L**2
    ov = min(max(ta, tb), 1) - max(min(ta, tb), 0)
    a1 = np.arctan2(l[3] - l[1], l[2] - l[0])
    a2 = np.arctan2(r[3] - r[1], r[2] - r[0])
    da = abs(a1 - a2) % np.pi
    da = min(da, np.pi - da)
    return perp < perp_tol and ov > ov_min and da < ang_tol


cfg = DetectConfig()
lines, mask = detect_line_segments(jnp.asarray(gray), cfg)
lines = np.asarray(lines)[np.asarray(mask)]
ref_long = ref[np.hypot(ref[:, 2] - ref[:, 0], ref[:, 3] - ref[:, 1]) > 40]
missed = [r for r in ref_long if not any(_match(l, r) for l in lines)]
near_missed = [
    r
    for r in ref_long
    if not any(_match(l, r) for l in lines)
    and any(_match(l, r, perp_tol=8.0, ov_min=0.25, ang_tol=0.3) for l in lines)
]
print(f"detected {len(lines)} lines; ref_long {len(ref_long)}; "
      f"missed {len(missed)} (near-missed {len(near_missed)})")

# for each missed segment: check edge-pixel support and Hough-bin quantities
g = gaussian_blur5(jnp.asarray(gray))
gx, gy = image_ops.sobel3(g)
mag = np.asarray(jnp.abs(gx) + jnp.abs(gy))
keep = np.asarray(image_ops._nms(jnp.asarray(mag), gx, gy) & (jnp.asarray(mag) > cfg.grad_threshold))
psi = np.mod(np.arctan2(np.asarray(gy), np.asarray(gx)), math.pi)

H, W = gray.shape
for r in missed:
    x1, y1, x2, y2 = r[:4]
    L = math.hypot(x2 - x1, y2 - y1)
    n_samp = int(L)
    ts = np.linspace(0, 1, n_samp)
    xs = (x1 + ts * (x2 - x1)).astype(int).clip(0, W - 1)
    ys = (y1 + ts * (y2 - y1)).astype(int).clip(0, H - 1)
    # count NMS edge pixels within 2px of the segment (check a 5px band)
    supp = 0
    ang_line = math.atan2(y2 - y1, x2 - x1)
    normal = np.mod(ang_line + math.pi / 2, math.pi)
    for x, y in zip(xs, ys):
        found = False
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                yy, xx = y + dy, x + dx
                if 0 <= yy < H and 0 <= xx < W and keep[yy, xx]:
                    d_ang = abs(psi[yy, xx] - normal) % math.pi
                    d_ang = min(d_ang, math.pi - d_ang)
                    if d_ang < math.radians(cfg.inlier_angle_tol_deg):
                        found = True
        supp += found
    print(
        f"missed seg len={L:5.1f} ang={math.degrees(ang_line):6.1f} "
        f"({x1:5.1f},{y1:5.1f})-({x2:5.1f},{y2:5.1f}) edge-support {supp}/{n_samp}"
    )
