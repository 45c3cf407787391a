"""For each missed segment: locate its Hough bin, check NMS survival + rank."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp
import math

from cube_slam_wu_tpu.ops.detect import DetectConfig, detect_line_segments, gaussian_blur5
from cube_slam_wu_tpu.ops import image as image_ops
from cube_slam_wu_tpu.utils import io as uio

base = "/root/reference/detect_3d_cuboid/data"
gray = uio.load_image_gray(f"{base}/0000_rgb_raw.jpg")
cfg = DetectConfig()
H, W = gray.shape

g = gaussian_blur5(jnp.asarray(gray))
gx, gy = image_ops.sobel3(g)
mag = jnp.abs(gx) + jnp.abs(gy)
keep = image_ops._nms(mag, gx, gy) & (mag > cfg.grad_threshold)
psi = np.mod(np.arctan2(np.asarray(gy), np.asarray(gx)), math.pi)
mag = np.asarray(mag); keep = np.asarray(keep)

NE = min(cfg.max_edge_pixels, H * W)
score_flat = np.where(keep, mag, 0.0).reshape(-1)
top_pix = np.argsort(score_flat)[::-1][:NE]
flat_w = score_flat[top_pix]
flat_y = (top_pix // W).astype(float)
flat_x = (top_pix % W).astype(float)
flat_psi = psi.reshape(-1)[top_pix]

NT = cfg.n_theta
diag = math.hypot(H, W)
NR = int(2 * diag / cfg.rho_bin) + 2
rho_off = diag
tbin0 = np.floor(flat_psi / (math.pi / NT)).astype(int) % NT
acc = np.zeros((NT, NR))
for dt in (-1, 0, 1):
    tb = (tbin0 + dt) % NT
    theta = (tb + 0.5) * (math.pi / NT)
    rho = flat_x * np.cos(theta) + flat_y * np.sin(theta)
    rb = np.clip(((rho + rho_off) / cfg.rho_bin).astype(int), 0, NR - 1)
    np.add.at(acc, (tb, rb), flat_w)

# NMS as in detect.py
def roll0(a, s): return np.roll(a, s, 0)
lo1 = np.roll(acc, 1, 1); lo1[:, 0] = 0
hi1 = np.roll(acc, -1, 1); hi1[:, -1] = 0
neigh = np.maximum(acc, np.maximum(roll0(acc, 1), roll0(acc, -1)))
neigh = np.maximum(neigh, np.maximum(np.roll(neigh, 1, 1), np.roll(neigh, -1, 1)))
# approximate separable like code: max over 3x3
from scipy.ndimage import maximum_filter
neigh = maximum_filter(acc, size=(3, 3), mode="constant")
# wrap for theta axis
acc_wrap = np.concatenate([acc[-1:], acc, acc[:1]], 0)
neigh = maximum_filter(acc_wrap, size=(3, 3), mode="constant")[1:-1]
is_peak = (acc >= neigh) & (acc > 0)
peak_vals = np.where(is_peak, acc, 0.0).reshape(-1)
order = np.argsort(peak_vals)[::-1]
rank_of = np.empty_like(order)
rank_of[order] = np.arange(len(order))

missed = [
    (604.9, 61.8, 611.5, 15.4), (366.3, 46.9, 366.2, 135.6),
    (624.9, 115.9, 635.8, 46.5), (220.3, 133.2, 225.3, 185.7),
    (91.9, 212.1, 184.3, 195.4), (0.5, 228.8, 83.0, 213.7),
    (399.4, 218.0, 340.6, 218.6), (408.0, 368.2, 411.2, 310.6),
    (292.8, 424.4, 284.3, 372.9), (275.4, 394.4, 285.4, 458.2),
    (302.2, 479.3, 294.2, 433.2), (291.3, 434.5, 299.3, 478.1),
    (219.1, 439.8, 275.5, 479.6), (278.4, 479.0, 235.7, 449.2),
]
print(f"total NMS peaks>0: {(peak_vals>0).sum()}, n_peaks cap {cfg.n_peaks}")
for x1, y1, x2, y2 in missed:
    ang = math.atan2(y2 - y1, x2 - x1)
    nrm = (ang + math.pi / 2) % math.pi
    tb = int(nrm / (math.pi / NT)) % NT
    th = (tb + 0.5) * (math.pi / NT)
    mx, my = (x1 + x2) / 2, (y1 + y2) / 2
    rho = mx * math.cos(th) + my * math.sin(th)
    rb = int((rho + rho_off) / cfg.rho_bin)
    # look in a neighborhood +-2 bins
    best = None
    for dt in range(-2, 3):
        for dr in range(-3, 4):
            t, r_ = (tb + dt) % NT, rb + dr
            if 0 <= r_ < NR:
                v = acc[t, r_]
                pk = is_peak[t, r_]
                rk = rank_of[t * NR + r_] if pk else -1
                if best is None or v > best[0]:
                    best = (v, pk, rk, t, r_)
    v, pk, rk, t, r_ = best
    print(f"seg ({x1:5.1f},{y1:5.1f})-({x2:5.1f},{y2:5.1f}): best acc {v:8.0f} "
          f"is_peak={pk} rank={rk if pk else 'n/a'}")
