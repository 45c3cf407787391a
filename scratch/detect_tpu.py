import time, numpy as np, jax, jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")
from cube_slam_wu_tpu.ops.detect import detect_line_segments, DetectConfig
from cube_slam_wu_tpu.utils import io as uio
dtype = jnp.float32
gray = jnp.asarray(uio.load_image_gray("/root/reference/detect_3d_cuboid/data/0000_rgb_raw.jpg"), dtype)
def make(n):
    @jax.jit
    def run():
        def body(c, _):
            lines, mask = detect_line_segments(gray + c * 0)
            return jnp.sum(jnp.where(mask, lines[:, 0], 0.0)), None
        out, _ = jax.lax.scan(body, jnp.asarray(0.0, dtype), None, length=n)
        return out
    return run
f2, f8 = make(2), make(8)
float(np.asarray(f2())); float(np.asarray(f8()))
def best(f, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(np.asarray(f())); ts.append(time.perf_counter()-t0)
    return min(ts)
dt = (best(f8) - best(f2)) / 6
print(f"detect_line_segments TPU: {dt*1e3:.1f} ms/frame")
