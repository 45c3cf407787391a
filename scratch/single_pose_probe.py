"""Time single-pose (RP=1) vs full grid, plus truncated pieces, on TPU."""
import time, sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import cube_slam_wu_tpu.ops.proposal as prop
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

def slope(make, n_lo=2, n_hi=16):
    f_lo, f_hi = make(n_lo), make(n_hi)
    np.asarray(f_lo()); np.asarray(f_hi())
    def best(f, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); np.asarray(f()); ts.append(time.perf_counter()-t0)
        return min(ts)
    return max((best(f_hi)-best(f_lo))/(n_hi-n_lo), 0)

def time_cfg(name, cfg):
    def make(n):
        @jax.jit
        def run():
            def body(c, _):
                return jnp.sum(prop.detect_cuboid_single(gray + c*0, K, T, bbox, lines, mask, cfg).pos), None
            o, _ = jax.lax.scan(body, jnp.asarray(0.0, dtype), None, length=n)
            return o
        return run
    print(f"{name:<40} {slope(make)*1e3:8.2f} ms", flush=True)

time_cfg("full grid (RP=25)", prop.ProposalConfig(max_lines=L, sample_cam_roll_pitch=True))
time_cfg("single pose (RP=1)", prop.ProposalConfig(max_lines=L))
L2 = 64
lines = jnp.asarray(ln[:L2], dtype); mask = jnp.asarray(mk[:L2])
time_cfg("single pose L=64", prop.ProposalConfig(max_lines=L2))
time_cfg("full grid L=64", prop.ProposalConfig(max_lines=L2, sample_cam_roll_pitch=True))
