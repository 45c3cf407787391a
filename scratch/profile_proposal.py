"""Stage-level timing of the proposal engine on TPU (relay-safe: N-iteration on-device loops)."""
import time, numpy as np, jax, jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")
from cube_slam_wu_tpu.ops import image as image_ops
from cube_slam_wu_tpu.ops import lines as line_ops
from cube_slam_wu_tpu.ops.detect import detect_line_segments, DetectConfig
from cube_slam_wu_tpu.utils import io as uio

dtype = jnp.float32
base = "/root/reference/detect_3d_cuboid/data/"
gray = jnp.asarray(uio.load_image_gray(base + "0000_rgb_raw.jpg"), dtype)
edges = uio.read_number_txt(base + "edge_detection/LSD/0000_edge.txt")
L = 320
lines_np = np.zeros((L, 4)); lines_np[:len(edges)] = edges[:, :4]
mask_np = np.zeros(L, bool); mask_np[:len(edges)] = True
lines = jnp.asarray(lines_np, dtype); mask = jnp.asarray(mask_np)

def timed(name, fn, n_lo=4, n_hi=32):
    def make(n):
        @jax.jit
        def run():
            def body(c, _):
                out = fn(c)
                return out, None
            out, _ = jax.lax.scan(body, jnp.asarray(0.0, dtype), None, length=n)
            return out
        return run
    f_lo, f_hi = make(n_lo), make(n_hi)
    float(np.asarray(f_lo())); float(np.asarray(f_hi()))
    def best(f, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(np.asarray(f())); ts.append(time.perf_counter()-t0)
        return min(ts)
    dt = max((best(f_hi) - best(f_lo)) / (n_hi - n_lo), 0)
    print(f"{name:<28} {dt*1e3:8.3f} ms")
    return dt

# stage: canny (sobel+nms+hysteresis)
timed("canny full", lambda c: jnp.sum(image_ops.canny(gray + c*0) .astype(dtype)))
# stage: sobel+nms only
def nms_only(c):
    g = gray + c*0
    gx, gy = image_ops.sobel3(g)
    m = jnp.abs(gx)+jnp.abs(gy)
    return jnp.sum(image_ops._nms(m, gx, gy).astype(dtype))
timed("sobel+nms", nms_only)
# stage: EDT
edge_mask = image_ops.canny(gray)
timed("EDT (480x640)", lambda c: jnp.sum(image_ops.distance_transform(edge_mask ^ (c > 1e9))))
# stage: merge_break_lines
timed("merge_break_lines", lambda c: jnp.sum(line_ops.merge_break_lines(lines + c*0, mask)[0]))
# stage: full detect_line_segments (used in online mode)
timed("detect_line_segments", lambda c: jnp.sum(detect_line_segments(gray + c*0)[0]), n_lo=2, n_hi=10)
