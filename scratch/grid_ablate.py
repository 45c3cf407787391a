"""Ablate proposal-grid stages on TPU by monkeypatching scorers."""
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
    fn = prop.detect_cuboid_single
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

timed("full")
# ablate dist gathers: constant distance
orig_dist = prop._edge_dist_score
def fake_dist(dist_map, cx, cy, config_id, reweight):
    return jnp.sum(cx, axis=0) * 0.0 + 1.0
prop._edge_dist_score = fake_dist
prop.detect_cuboid_single = prop.detect_cuboid_single.__wrapped__  # unjitted
prop.detect_cuboid_single = jax.jit(prop.detect_cuboid_single, static_argnames=("cfg","return_internals"))
timed("no dist gathers")
prop._edge_dist_score = orig_dist
# ablate angle score
orig_angle = prop._edge_angle_score
prop._edge_angle_score = lambda aa, ab, h, cx, cy, cid: jnp.sum(cx, axis=0) * 0.0
prop.detect_cuboid_single = jax.jit(prop.detect_cuboid_single.__wrapped__, static_argnames=("cfg","return_internals"))
timed("no angle score")
prop._edge_angle_score = orig_angle
# ablate lifting
orig_lift = prop._lift_soa
def fake_lift(cx, cy, Kinv, Twc, plane):
    z = jnp.sum(cx, axis=0) * 0.0
    return z, z, z + 0.3, z + 0.3, z + 0.3, z + 0.3
prop._lift_soa = fake_lift
prop.detect_cuboid_single = jax.jit(prop.detect_cuboid_single.__wrapped__, static_argnames=("cfg","return_internals"))
timed("no lifting")
prop._lift_soa = orig_lift
# ablate fusion sorts
orig_fuse = prop.fuse_normalized_scores
prop.fuse_normalized_scores = lambda d, a, v, w, n: (jnp.where(v, d + w*a, jnp.inf), v)
prop.detect_cuboid_single = jax.jit(prop.detect_cuboid_single.__wrapped__, static_argnames=("cfg","return_internals"))
timed("no fusion sorts")
