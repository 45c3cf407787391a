import time, numpy as np, jax, jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")
import cube_slam_wu_tpu.ops.proposal as prop
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
    fn = jax.jit(prop.detect_cuboid_single.__wrapped__, static_argnames=("cfg","return_internals"))
    def make(n):
        @jax.jit
        def run():
            def body(c, _):
                return jnp.sum(fn(gray + c*0, K, T, bbox, lines, mask, cfg).pos), None
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

# ablate vp support (keep everything else)
orig_sup = prop.vp_support_edge_angles
def fake_sup(vps, mids, angles, mask, t12, t3):
    sh = vps.shape[:-2] + (3,)
    z = jnp.sum(vps, axis=(-1, -2), keepdims=False)[..., None] * 0.0
    z3 = jnp.broadcast_to(z, sh)
    return z3, z3, z3 > -1.0
prop.vp_support_edge_angles = fake_sup
timed("no vp_support")
prop.vp_support_edge_angles = orig_sup

# ablate corner chain (trivial corners)
orig_chain = prop._corner_chain
def fake_chain(vp, c1x, c1y, g, config_id, thr):
    H = c1x.shape[0]
    base_x = c1x + vp["v1x"] * 0.0
    cx = jnp.stack([base_x + 10*k for k in range(8)])
    cy = jnp.stack([c1y + 10*k + vp["v2y"]*0.0 for k in range(8)])
    return cx, cy, jnp.ones(H, jnp.int32), jnp.ones(H, bool)
prop._corner_chain = fake_chain
timed("no corner chain")
prop._corner_chain = orig_chain

# ablate merge (identity)
import cube_slam_wu_tpu.ops.lines as lo
orig_merge = lo.merge_break_lines
lo.merge_break_lines = lambda l, m, *a, **k: (l, m)
timed("no merge loop")
lo.merge_break_lines = orig_merge

# ablate canny+EDT (constant dist map)
import cube_slam_wu_tpu.ops.image as imo
orig_roi = imo.roi_canny_distance_map
imo.roi_canny_distance_map = lambda g, *a, **k: g * 0.0 + 1.0
timed("no canny/EDT")
imo.roi_canny_distance_map = orig_roi
