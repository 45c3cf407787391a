"""TPU timing of the gather-based line detector (slope trick)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from cube_slam_wu_tpu.ops.detect import DetectConfig, detect_line_segments
from cube_slam_wu_tpu.utils import io as uio

print("devices:", jax.devices())
gray = jnp.asarray(
    uio.load_image_gray("/root/reference/object_slam/data/raw_imgs/0000_rgb_raw.jpg"),
    jnp.float32,
)
print("img", gray.shape)
cfg = DetectConfig()


def make(n):
    @jax.jit
    def run():
        def body(carry, _):
            lines, m = detect_line_segments(gray + carry * 0.0, cfg)
            return jnp.sum(jnp.where(m, lines[:, 0], 0.0)) * 0.0, None

        out, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), None, length=n)
        return out

    return run


f2, f8 = make(2), make(8)
np.asarray(f2()); np.asarray(f8())
def best(f, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f()); ts.append(time.perf_counter() - t0)
    return min(ts)
t2, t8 = best(f2), best(f8)
print(f"detector: {(t8 - t2) / 6 * 1e3:.2f} ms/frame")
