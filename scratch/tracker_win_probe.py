"""Window-extraction strategies for the ZNCC tracker, measured on TPU.

The (K, 57, 57) per-corner search windows are contiguous blocks of the
image, but the production code materializes them with a per-element flat
take (5.5 ms at K=256 — the measured ~6.7 ns/elem TPU gather floor).
Blocks should not have to pay per-element rates.  Candidates:

  A. flat per-element take (baseline, exact current semantics)
  B. scan over K of lax.dynamic_slice on an edge-padded image
  C. row-gather (take axis 0 of the padded image) then per-corner column
     selection via a batched one-hot einsum (MXU does the column pick)
  D. row-gather then per-element column take (isolates the row stage)

B/C/D operate on an edge-padded image; for in-image corner centres the
replicate padding makes their window VALUES identical to A's index clip.
"""
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

from cube_slam_wu_tpu.utils import io as uio

dtype = jnp.float32
gray_np = uio.load_image_gray(
    "/root/reference/detect_3d_cuboid/data/0000_rgb_raw.jpg"
)
gray = jnp.asarray(gray_np, dtype)
H, W = gray.shape
rng = np.random.default_rng(0)
r, s = 4, 24
wr = s + r
Wd = 2 * wr + 1

for K in (96, 256):
    x0 = jnp.asarray(rng.integers(0, W, K), jnp.int32)
    y0 = jnp.asarray(rng.integers(0, H, K), jnp.int32)
    off = jnp.arange(-wr, wr + 1)
    wy = jnp.clip(y0[:, None] + off[None, :], 0, H - 1)
    wx = jnp.clip(x0[:, None] + off[None, :], 0, W - 1)
    idx = wy[:, :, None] * W + wx[:, None, :]

    def timed(name, body_fn, n_lo=2, n_hi=32):
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

        dt = max(
            (best(np.int32(n_hi)) - best(np.int32(n_lo))) / (n_hi - n_lo), 0
        )
        print(f"K={K} {name:<40} {dt * 1e3:8.3f} ms", flush=True)
        return dt

    def a_flat(c):
        win = jnp.take((gray + c * 1e-32).reshape(-1), idx)
        return jnp.sum(win) * 1e-42

    timed("A flat per-element take", a_flat)

    def b_scan(c):
        pad = jnp.pad(gray + c * 1e-32, wr, mode="edge")

        def step(carry, se):
            y, x = se
            w = jax.lax.dynamic_slice(pad, (y, x), (Wd, Wd))
            return carry + jnp.sum(w) * 1e-42, None

        out, _ = jax.lax.scan(
            step, jnp.asarray(0.0, dtype), (y0, x0)
        )
        return out

    timed("B scan dynamic_slice (edge-padded)", b_scan)

    # one-hot column selectors: (K, Wp, Wd) with Wp = W + 2*wr
    Wp = W + 2 * wr
    cols = x0[:, None] + jnp.arange(Wd)[None, :]  # (K, Wd) in padded coords
    onehot = (
        jnp.arange(Wp)[None, :, None] == cols[:, None, :]
    ).astype(dtype)

    def c_rowgather_einsum(c):
        pad = jnp.pad(gray + c * 1e-32, wr, mode="edge")
        rows = pad[y0[:, None] + wr + off[None, :]]  # (K, Wd, Wp) padded rows
        win = jnp.einsum(
            "kvp,kpc->kvc", rows, onehot,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.sum(win) * 1e-42

    timed("C row-gather + one-hot einsum cols", c_rowgather_einsum)

    def d_rowgather_take(c):
        pad = jnp.pad(gray + c * 1e-32, wr, mode="edge")
        rows = pad[y0[:, None] + wr + off[None, :]]  # (K, Wd, Wp) padded rows
        win = jnp.take_along_axis(
            rows, jnp.broadcast_to(cols[:, None, :], (K, Wd, Wd)), axis=2
        )
        return jnp.sum(win) * 1e-42

    timed("D row-gather + per-element col take", d_rowgather_take)

print("done", flush=True)
