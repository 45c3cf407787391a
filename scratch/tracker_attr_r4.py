"""Round-4b attribution for the ZNCC tracker: harris vs track_corners vs
the depthwise-conv numerator inside track_corners, measured on TPU with the
chained-fori-loop methodology (PERF.md)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

try:
    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_bench_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

from cube_slam_wu_tpu.slam import features as F
from cube_slam_wu_tpu.utils import io as uio

dtype = jnp.float32
gray_np = uio.load_image_gray(
    "/root/reference/detect_3d_cuboid/data/0000_rgb_raw.jpg"
)
gray = jnp.asarray(gray_np, dtype)
gray2 = jnp.asarray(np.roll(gray_np, (1, 2), (0, 1)), dtype)
rng = np.random.default_rng(0)
K = 256
pts = jnp.asarray(
    np.stack(
        [rng.uniform(30, 610, K), rng.uniform(30, 450, K)], axis=-1
    ),
    dtype,
)
mask = jnp.ones((K,), bool)


def timed(name, body_fn, n_lo=2, n_hi=16):
    @jax.jit
    def run(n):
        def body(_, c):
            return body_fn(c)

        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, dtype))

    float(np.asarray(run(np.int32(n_lo))))
    float(np.asarray(run(np.int32(n_hi))))

    def best(n, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(run(np.int32(n))))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = max((best(np.int32(n_hi)) - best(np.int32(n_lo))) / (n_hi - n_lo), 0)
    print(f"{name:<44} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def harris_body(c):
    p, m = F.harris_corners(gray + c * 1e-32)
    return jnp.sum(jnp.where(m, p[:, 0], 0.0)) * 1e-42


timed("harris_corners (VGA, K=256)", harris_body)


def track_body(c):
    np_, tr, z = F.track_corners(gray + c * 1e-32, gray2, pts, mask)
    return jnp.sum(jnp.where(tr, z, 0.0)) * 1e-42


timed("track_corners (K=256, r=4, s=24)", track_body)

# isolate the depthwise-conv numerator at the same shapes
r, s = 4, 24
wr = s + r
Wd = 2 * wr + 1
win0 = jnp.asarray(rng.normal(size=(K, Wd, Wd)).astype(np.float32), dtype)
ref = jnp.asarray(
    rng.normal(size=(K, (2 * r + 1) ** 2)).astype(np.float32), dtype
)


def conv_body(c):
    num = jax.lax.conv_general_dilated(
        (win0 + c * 1e-32)[None],
        ref.reshape(K, 1, 2 * r + 1, 2 * r + 1),
        window_strides=(1, 1),
        padding="VALID",
        feature_group_count=K,
        precision=jax.lax.Precision.HIGHEST,
    )[0]
    return jnp.sum(num) * 1e-42


timed("depthwise 9x9 VALID conv (K=256, 57x57)", conv_body)


# candidate replacement: 81 shifted fused multiply-adds on (K, D1, D1)
D1 = 2 * s + 1
ref_img = ref.reshape(K, 2 * r + 1, 2 * r + 1)


def shift_body(c):
    w = win0 + c * 1e-32
    acc = jnp.zeros((K, D1, D1), dtype)
    for py in range(2 * r + 1):
        for px in range(2 * r + 1):
            acc = acc + ref_img[:, py, px][:, None, None] * jax.lax.dynamic_slice(
                w, (0, py, px), (K, D1, D1)
            )
    return jnp.sum(acc) * 1e-42


timed("shift-accumulate numerator (81 fma slices)", shift_body)

# window gather alone
x0 = jnp.round(pts[:, 0]).astype(jnp.int32)
y0 = jnp.round(pts[:, 1]).astype(jnp.int32)
off = jnp.arange(-wr, wr + 1)
H, W = gray.shape
wy = jnp.clip(y0[:, None] + off[None, :], 0, H - 1)
wx = jnp.clip(x0[:, None] + off[None, :], 0, W - 1)
idx = wy[:, :, None] * W + wx[:, None, :]


def gather_body(c):
    win = jnp.take((gray2 + c * 1e-32).reshape(-1), idx)
    return jnp.sum(win) * 1e-42


timed("window gather (K x 57 x 57 flat take)", gather_body)
print("done", flush=True)
