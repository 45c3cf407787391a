"""Does the line detector amortize under frame batching (vmap)?

The proposal grid did not (26 ms/obj at batch 4 vs 21.8 single); the
detector is scatter/Hough-heavy with different op mix — measure it.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timed_loop(make_step, n_lo=2, n_hi=10):
    f_lo = make_step(n_lo)
    f_hi = make_step(n_hi)
    float(np.asarray(f_lo()))
    float(np.asarray(f_hi()))

    def best_of(f, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f()))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return max((best_of(f_hi) - best_of(f_lo)) / (n_hi - n_lo), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    from cube_slam_wu_tpu.ops.detect import DetectConfig, detect_line_segments
    from cube_slam_wu_tpu.utils import io as uio

    base = "/root/reference/detect_3d_cuboid/data/"
    gray_np = uio.load_image_gray(base + "0000_rgb_raw.jpg")
    gray = jnp.asarray(gray_np, jnp.float32)
    cfg = DetectConfig()

    for B in (1, 4, 8):
        batch = jnp.broadcast_to(gray, (B,) + gray.shape) + jnp.arange(
            B, dtype=jnp.float32
        ).reshape(B, 1, 1)

        def make_step(n, batch=batch):
            @jax.jit
            def f():
                def body(c, _):
                    segs, mask = jax.vmap(
                        lambda g: detect_line_segments(g, cfg)
                    )(batch + c * 1e-6)
                    return c + jnp.sum(segs) * 0.0 + 1.0, jnp.sum(mask)

                c, outs = jax.lax.scan(body, 0.0, None, length=n)
                return c + jnp.sum(outs).astype(jnp.float32)

            return f

        sec = timed_loop(make_step)
        print(
            f"batch {B}: {sec*1e3:8.1f} ms/call -> {sec/B*1e3:6.1f} ms/frame",
            flush=True,
        )


if __name__ == "__main__":
    main()
