"""Ablate the SEQUENTIAL structures in the proposal grid on TPU:
per-ROI merge while_loop, canny+EDT, vp_support. Slope-timed."""
import time, numpy as np, jax, jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")
import cube_slam_wu_tpu.ops.proposal as prop
import cube_slam_wu_tpu.ops.lines as lines_mod
import cube_slam_wu_tpu.ops.image as image_mod
from cube_slam_wu_tpu.utils import io as uio

dtype = jnp.float32
base = "/root/reference/detect_3d_cuboid/data/"
gray = jnp.asarray(uio.load_image_gray(base + "0000_rgb_raw.jpg"), dtype)
edges = uio.read_number_txt(base + "edge_detection/LSD/0000_edge.txt")
L = 320
lines_np = np.zeros((L, 4)); lines_np[:len(edges)] = edges[:, :4]
mask_np = np.zeros(L, bool); mask_np[:len(edges)] = True
lines = jnp.asarray(lines_np, dtype); mask = jnp.asarray(mask_np)
K = jnp.asarray([[529.5,0,365.],[0,529.5,265.],[0,0,1.]], dtype)
T = jnp.asarray([[1,0.0011,0.0004,0],[0,-0.3376,0.9413,0],[0.0011,-0.9413,-0.3376,1.35],[0,0,0,1.]], dtype)
bbox = jnp.asarray([187.,188.,201.,311.], dtype)
cfg = prop.ProposalConfig(max_lines=L, sample_cam_roll_pitch=True)

def timed(name, n_lo=2, n_hi=16):
    fn = jax.jit(prop.detect_cuboid_single.__wrapped__, static_argnames=("cfg", "return_internals"))
    def make(n):
        @jax.jit
        def run():
            def body(c, _):
                return jnp.sum(fn(gray + c*0, K, T, bbox, lines, mask, cfg=cfg).pos), None
            out, _ = jax.lax.scan(body, jnp.asarray(0.0, dtype), None, length=n)
            return out
        return run
    f_lo, f_hi = make(n_lo), make(n_hi)
    float(np.asarray(f_lo())); float(np.asarray(f_hi()))
    def best2(f, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(np.asarray(f())); ts.append(time.perf_counter()-t0)
        return min(ts)
    dt = max((best2(f_hi) - best2(f_lo)) / (n_hi - n_lo), 0)
    print(f"{name:<30} {dt*1e3:8.3f} ms", flush=True)

timed("full")

orig_merge = lines_mod.merge_break_lines
def fake_merge(l, m, dist, ang, minlen, max_iters=None):
    keep = m & (lines_mod.line_lengths(l) > minlen)
    return l, keep
lines_mod.merge_break_lines = fake_merge
prop.line_ops.merge_break_lines = fake_merge
timed("no ROI merge")
lines_mod.merge_break_lines = orig_merge
prop.line_ops.merge_break_lines = orig_merge

import cube_slam_wu_tpu.ops.image as img
orig_c = img.canny
img.canny = lambda g, *a, **k: (g > 1e9)
timed("no canny")
img.canny = orig_c

orig_edt = img.distance_transform
img.distance_transform = lambda e, *a, **k: jnp.zeros(e.shape, dtype) + 1.0
timed("no EDT")

img.canny = lambda g, *a, **k: (g > 1e9)
lines_mod.merge_break_lines = fake_merge
prop.line_ops.merge_break_lines = fake_merge
timed("no canny+EDT+merge")

# restore all patches
img.canny = orig_c
img.distance_transform = orig_edt
lines_mod.merge_break_lines = orig_merge
prop.line_ops.merge_break_lines = orig_merge

# grid scaling: halve/quarter the hypothesis count via yaw samples
import dataclasses
for ys in (16, 8, 4, 2):
    cfg = prop.ProposalConfig(max_lines=L, sample_cam_roll_pitch=True, n_yaw=ys)
    timed(f"n_yaw={ys}")
for rp in (5, 3, 1):
    cfg = prop.ProposalConfig(max_lines=L, sample_cam_roll_pitch=True, n_roll_pitch=rp)
    timed(f"n_roll_pitch={rp}")
