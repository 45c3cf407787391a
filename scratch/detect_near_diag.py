"""Inspect detected lines near the remaining missed ref segments."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp
import math, dataclasses

from cube_slam_wu_tpu.ops.detect import DetectConfig, detect_line_segments
from cube_slam_wu_tpu.utils import io as uio

base = "/root/reference/detect_3d_cuboid/data"
gray = uio.load_image_gray(f"{base}/0000_rgb_raw.jpg")

cfg = DetectConfig()
lines, mask = detect_line_segments(jnp.asarray(gray), cfg)
lines = np.asarray(lines)[np.asarray(mask)]
print("n detected:", len(lines), "cap:", cfg.max_output)

big = dataclasses.replace(cfg, max_output=640)
lines_b, mask_b = detect_line_segments(jnp.asarray(gray), big)
lines_b = np.asarray(lines_b)[np.asarray(mask_b)]
print("n detected with cap 640:", len(lines_b))

missed = [
    (91.9, 212.1, 184.3, 195.4), (0.5, 228.8, 83.0, 213.7),
    (320.8, 217.3, 361.8, 227.4), (472.5, 244.2, 511.2, 227.8),
    (219.1, 439.8, 275.5, 479.6), (278.4, 479.0, 235.7, 449.2),
]
for r in missed:
    r = np.array(r)
    qa, qb = r[:2], r[2:]
    d = qb - qa
    L = np.linalg.norm(d)
    n = np.array([-d[1], d[0]]) / L
    print(f"--- ref ({r[0]:.0f},{r[1]:.0f})-({r[2]:.0f},{r[3]:.0f}) "
          f"ang {math.degrees(math.atan2(d[1], d[0])):.1f}")
    for l in lines_b:
        perp = max(abs((l[:2] - qa) @ n), abs((l[2:] - qa) @ n))
        ta, tb = (l[:2] - qa) @ d / L**2, (l[2:] - qa) @ d / L**2
        ov = min(max(ta, tb), 1) - max(min(ta, tb), 0)
        a1 = math.atan2(l[3] - l[1], l[2] - l[0])
        a2 = math.atan2(d[1], d[0])
        da = abs(a1 - a2) % np.pi
        da = min(da, np.pi - da)
        if perp < 10 and ov > 0.1:
            print(f"   cand ({l[0]:6.1f},{l[1]:6.1f})-({l[2]:6.1f},{l[3]:6.1f}) "
                  f"perp {perp:5.2f} ov {ov:5.2f} dang {math.degrees(da):5.2f}")
