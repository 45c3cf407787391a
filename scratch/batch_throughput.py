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
cfg = ProposalConfig(max_lines=L, sample_cam_roll_pitch=True)

for B in (4, 16):
    gray_b = jnp.broadcast_to(gray, (B,) + gray.shape)
    bbox_b = jnp.broadcast_to(bbox, (B, 4))
    def make(n):
        @jax.jit
        def run():
            def body(c, _):
                res = jax.vmap(lambda g, b: detect_cuboid_single(g + c*0, K, T, b, lines, mask, cfg))(gray_b, bbox_b)
                return jnp.sum(res.pos), None
            out, _ = jax.lax.scan(body, jnp.asarray(0.0, dtype), None, length=n)
            return out
        return run
    f_lo, f_hi = make(1, ), make(5)
    float(np.asarray(f_lo())); float(np.asarray(f_hi()))
    def best2(f, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(np.asarray(f())); ts.append(time.perf_counter()-t0)
        return min(ts)
    dt = max((best2(f_hi) - best2(f_lo)) / 4, 1e-9)
    print(f"batch {B}: {dt*1e3:.1f} ms/call -> {B/dt:.0f} obj/s ({dt/B*1e3:.2f} ms/obj)", flush=True)
