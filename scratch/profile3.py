import time, numpy as np, jax, jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")
from cube_slam_wu_tpu.ops.proposal import detect_cuboid_single, ProposalConfig
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

def timed(name, fn, n_lo=2, n_hi=16):
    def make(n):
        @jax.jit
        def run():
            def body(c, _):
                return fn(c), None
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
    print(f"{name:<34} {dt*1e3:8.3f} ms", flush=True)

cfg1 = ProposalConfig(max_lines=L, sample_cam_roll_pitch=False)   # 768 hyps
cfg25 = ProposalConfig(max_lines=L, sample_cam_roll_pitch=True)   # 19200 hyps
cfg_small_lines = ProposalConfig(max_lines=64, sample_cam_roll_pitch=True)
timed("proposal RP=1 (768 hyp)", lambda c: jnp.sum(detect_cuboid_single(gray + c*0, K, T, bbox, lines, mask, cfg1).pos))
timed("proposal RP=25 (19k hyp)", lambda c: jnp.sum(detect_cuboid_single(gray + c*0, K, T, bbox, lines, mask, cfg25).pos))
timed("proposal RP=25, L=64", lambda c: jnp.sum(detect_cuboid_single(gray + c*0, K, T, bbox, lines[:64], mask[:64], cfg_small_lines).pos))
