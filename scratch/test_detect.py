import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from cube_slam_wu_tpu.ops.detect import detect_line_segments, DetectConfig
from cube_slam_wu_tpu.utils import io as uio

gray = jnp.asarray(uio.load_image_gray("/root/reference/detect_3d_cuboid/data/0000_rgb_raw.jpg"))
ref = uio.read_number_txt("/root/reference/detect_3d_cuboid/data/edge_detection/LSD/0000_edge.txt")
t0=time.time()
lines, mask = detect_line_segments(gray, DetectConfig())
lines = np.asarray(lines)[np.asarray(mask)]
print(f"{time.time()-t0:.1f}s  detected {len(lines)} lines; ref has {len(ref)}")

def seg_dist(a, b):
    # max endpoint distance to the other segment's infinite line + overlap measure
    pa, pb = a[:2], a[2:]
    qa, qb = b[:2], b[2:]
    d = qb - qa; L = np.linalg.norm(d)+1e-9; n = np.array([-d[1], d[0]])/L
    perp = max(abs((pa-qa)@n), abs((pb-qa)@n))
    ta, tb = (pa-qa)@d/L**2, (pb-qa)@d/L**2
    overlap = min(max(ta,tb),1) - max(min(ta,tb),0)
    return perp, overlap

ref_long = ref[np.hypot(ref[:,2]-ref[:,0], ref[:,3]-ref[:,1]) > 40]
hits = 0
for r in ref_long:
    ok = False
    for l in lines:
        perp, ov = seg_dist(l, r)
        a1 = np.arctan2(l[3]-l[1], l[2]-l[0]); a2 = np.arctan2(r[3]-r[1], r[2]-r[0])
        da = abs(a1-a2) % np.pi; da = min(da, np.pi-da)
        if perp < 4 and ov > 0.5 and da < 0.15:
            ok = True; break
    hits += ok
print(f"recall on {len(ref_long)} ref lines >40px: {hits}/{len(ref_long)} = {hits/len(ref_long):.2f}")
lens = np.hypot(lines[:,2]-lines[:,0], lines[:,3]-lines[:,1])
print("our line lengths: median", np.median(lens), "max", lens.max())
