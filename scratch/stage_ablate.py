"""Clean per-stage ablation of the full-grid proposal on TPU.
Each variant prints cost-analysis flops so a no-op patch is detectable."""
import time, sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import cube_slam_wu_tpu.ops.proposal as prop
import cube_slam_wu_tpu.ops.lines as lines_mod
import cube_slam_wu_tpu.ops.image as img
from cube_slam_wu_tpu.utils import io as uio

dtype = jnp.float32
base = "/root/reference/detect_3d_cuboid/data/"
gray = jnp.asarray(uio.load_image_gray(base + "0000_rgb_raw.jpg"), dtype)
edges = uio.read_number_txt(base + "edge_detection/LSD/0000_edge.txt")
L = 320
ln = np.zeros((L,4)); ln[:len(edges)] = edges[:, :4]
mk = np.zeros(L, bool); mk[:len(edges)] = True
lines = jnp.asarray(ln, dtype); mask = jnp.asarray(mk)
K = jnp.asarray([[529.5,0,365.],[0,529.5,265.],[0,0,1.]], dtype)
T = jnp.asarray([[1,0.0011,0.0004,0],[0,-0.3376,0.9413,0],[0.0011,-0.9413,-0.3376,1.35],[0,0,0,1.]], dtype)
bbox = jnp.asarray([187.,188.,201.,311.], dtype)
CFG = prop.ProposalConfig(max_lines=L, sample_cam_roll_pitch=True)

def measure(name):
    raw = prop.detect_cuboid_single.__wrapped__
    def make(n):
        @jax.jit
        def run():
            def body(c, _):
                r = raw(gray + c*0, K, T, bbox, lines, mask, cfg=CFG)
                return jnp.sum(r.pos), None
            o, _ = jax.lax.scan(body, jnp.asarray(0.0, dtype), None, length=n)
            return o
        return run
    # flops sanity on the n=1 variant
    low = jax.jit(lambda: raw(gray, K, T, bbox, lines, mask, cfg=CFG).pos).lower()
    ca = low.compile().cost_analysis()
    if isinstance(ca, list): ca = ca[0]
    fl = ca.get("flops", 0)
    f_lo, f_hi = make(2), make(16)
    np.asarray(f_lo()); np.asarray(f_hi())
    def best(f, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); np.asarray(f()); ts.append(time.perf_counter()-t0)
        return min(ts)
    dt = max((best(f_hi)-best(f_lo))/14, 0)
    print(f"{name:<26} {dt*1e3:8.2f} ms   flops={fl:.3e}", flush=True)

measure("full")

orig = {}

def patch(mod, name, fake):
    orig[(mod, name)] = getattr(mod, name)
    setattr(mod, name, fake)

def restore():
    for (mod, name), f in orig.items():
        setattr(mod, name, f)
    orig.clear()

# 1. corner chain -> trivial (keep shapes)
def fake_chain(vp, c1x, c1y, g, config_id, thr):
    H = c1x.shape[0]
    z = c1x * 0.0
    cx = jnp.stack([c1x + k for k in range(8)])
    cy = jnp.stack([c1y + z + k for k in range(8)])
    return cx, cy, (z + 1).astype(jnp.int32), z > -1.0
patch(prop, "_corner_chain", fake_chain)
measure("no corner chain")
restore()

# 2. dist score -> constant
patch(prop, "_edge_dist_score", lambda dm, cx, cy, cid, rw, bilinear=False: jnp.sum(cx, axis=0) * 0.0 + 1.0)
measure("no dist gathers")
restore()

# 3. angle score -> constant
patch(prop, "_edge_angle_score", lambda aa, ab, h, cx, cy, cid: jnp.sum(cx, axis=0) * 0.0)
measure("no angle score")
restore()

# 4. lift -> constant
def fake_lift(cx, cy, Kinv, Twc, plane):
    z = jnp.sum(cx, axis=0) * 0.0
    return z, z, z + 0.3, z + 0.3, z + 0.3, z + 0.3
patch(prop, "_lift_soa", fake_lift)
measure("no lift")
restore()

# 5. vp support -> constant
def fake_vps(vps, mids, angles, mask, t12, t3):
    sh = vps.shape[:-2] + (3,)
    a = jnp.zeros(sh, vps.dtype)
    return a, a + 0.5, jnp.ones(sh, bool)
patch(prop, "vp_support_edge_angles", fake_vps)
measure("no vp support")
restore()

# 6. fusion -> simple add
patch(prop, "fuse_normalized_scores", lambda d, a, v, w, n: (jnp.where(v, d + w*a, jnp.inf), v))
measure("no fusion sorts")
restore()

# 7. merge -> passthrough
def fake_merge(l, m, dist, ang, minlen, max_iters=None):
    return l, m & (lines_mod.line_lengths(l) > minlen)
patch(lines_mod, "merge_break_lines", fake_merge)
measure("no ROI merge")
restore()

# 8. canny+EDT -> constant map
patch(img, "canny", lambda g, *a, **k: (g > 1e9))
patch(img, "distance_transform", lambda e, *a, **k: jnp.zeros(e.shape, dtype) + 1.0)
measure("no canny+EDT")
restore()
