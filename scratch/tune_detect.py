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

def seg_match(l, r):
    qa, qb = r[:2], r[2:]
    d = qb - qa; L = np.linalg.norm(d)+1e-9; n = np.array([-d[1], d[0]])/L
    perp = max(abs((l[:2]-qa)@n), abs((l[2:]-qa)@n))
    ta, tb = (l[:2]-qa)@d/L**2, (l[2:]-qa)@d/L**2
    ov = min(max(ta,tb),1) - max(min(ta,tb),0)
    a1 = np.arctan2(l[3]-l[1], l[2]-l[0]); a2 = np.arctan2(r[3]-r[1], r[2]-r[0])
    da = abs(a1-a2) % np.pi; da = min(da, np.pi-da)
    return perp < 4 and ov > 0.5 and da < 0.15

def evaluate(cfg, label):
    t0=time.time()
    lines, mask = detect_line_segments(gray, cfg)
    lines = np.asarray(lines)[np.asarray(mask)]
    dt=time.time()-t0
    ref_long = ref[np.hypot(ref[:,2]-ref[:,0], ref[:,3]-ref[:,1]) > 40]
    hits = sum(any(seg_match(l, r) for l in lines) for r in ref_long)
    ref_med = ref[np.hypot(ref[:,2]-ref[:,0], ref[:,3]-ref[:,1]) > 20]
    hits_med = sum(any(seg_match(l, r) for l in lines) for r in ref_med)
    print(f"{label}: n={len(lines)} recall>40px={hits}/{len(ref_long)}={hits/len(ref_long):.2f} "
          f">20px={hits_med/len(ref_med):.2f} ({dt:.1f}s)")

evaluate(DetectConfig(), "base")
evaluate(DetectConfig(n_peaks=160), "peaks160")
evaluate(DetectConfig(n_peaks=160, rho_bin=1.5, inlier_rho_tol=1.8), "peaks160+rho1.5")
evaluate(DetectConfig(n_peaks=224, rho_bin=1.5, inlier_rho_tol=1.8, min_inliers=7), "peaks224+min7")
evaluate(DetectConfig(n_peaks=224, rho_bin=1.5, inlier_rho_tol=1.8, min_inliers=7, grad_threshold=20.0), "..grad20")

def precision(cfg, label):
    lines, mask = detect_line_segments(gray, cfg)
    lines = np.asarray(lines)[np.asarray(mask)]
    ours_long = lines[np.hypot(lines[:,2]-lines[:,0], lines[:,3]-lines[:,1]) > 40]
    prec = sum(any(seg_match(o, r) for r in ref) for o in ours_long)
    print(f"{label}: precision(long)={prec}/{len(ours_long)}={prec/max(len(ours_long),1):.2f}")

best = DetectConfig(n_peaks=224, rho_bin=1.5, inlier_rho_tol=1.8, min_inliers=7, runs_per_peak=6)
evaluate(best, "best+runs6")
precision(best, "best+runs6")
