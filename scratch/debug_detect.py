import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from cube_slam_wu_tpu.ops import detect as det
from cube_slam_wu_tpu.ops import image as image_ops, lines as line_ops
from cube_slam_wu_tpu.utils import io as uio
import math

gray = jnp.asarray(uio.load_image_gray("/root/reference/detect_3d_cuboid/data/0000_rgb_raw.jpg"))
cfg = det.DetectConfig()
g = det.gaussian_blur5(gray)
gx, gy = image_ops.sobel3(g)
mag = jnp.abs(gx) + jnp.abs(gy)
keep = image_ops._nms(mag, gx, gy) & (mag > cfg.grad_threshold)
print("edge pixels:", int(keep.sum()), "/", gray.size)

# run internals up to segs/valid by re-executing the function body pieces
lines, mask, strength = det.detect_line_segments(gray, cfg)
lines_np = np.asarray(lines); mask_np = np.asarray(mask)
print("valid stubs (strength>0):", int((np.asarray(strength) > 0).sum()))
print("after merge+filter:", mask_np.sum())
lens = np.hypot(lines_np[:,2]-lines_np[:,0], lines_np[:,3]-lines_np[:,1])[mask_np]
print("len hist:", np.percentile(lens, [10,50,90,100]).round(1))

# how many merges happened? count pre-merge stubs > 0 vs post
# check: do stub endpoints of collinear neighbors actually lie within merge_dist?
# pick the strongest stub, find nearest other stub
