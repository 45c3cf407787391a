"""TPU timing: fused Pallas hypothesis kernel vs unfused XLA path.

Uses the serializing-scan slope trick (axon relay: block_until_ready lies).
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from cube_slam_wu_tpu.ops.proposal import ProposalConfig, detect_cuboid_single
from cube_slam_wu_tpu.utils import io as uio

BASE = "/root/reference/detect_3d_cuboid/data/"
f32 = jnp.float32
gray = jnp.asarray(uio.load_image_gray(BASE + "0000_rgb_raw.jpg"), f32)
K = jnp.asarray([[529.5, 0, 365.0], [0, 529.5, 265.0], [0, 0, 1]], f32)
T = jnp.asarray(
    [
        [1, 0.0011, 0.0004, 0],
        [0, -0.3376, 0.9413, 0],
        [0.0011, -0.9413, -0.3376, 1.35],
        [0, 0, 0, 1.0],
    ],
    f32,
)
bbox = jnp.asarray([187.0, 188.0, 201.0, 311.0], f32)
edges = np.loadtxt(BASE + "edge_detection/LSD/0000_edge.txt")
L = 320
lines = np.zeros((L, 4), np.float32)
lines[: len(edges)] = edges[:, :4]
mask = np.zeros(L, bool)
mask[: len(edges)] = True
lines = jnp.asarray(lines)
mask = jnp.asarray(mask)


def timeit(cfg, label):
    def once(box):
        r = detect_cuboid_single(gray, K, T, box, lines, mask, cfg)
        return r

    def make(n):
        @jax.jit
        def run(box):
            def body(c, _):
                r = once(c)
                # serializing carry: perturb the box by a tiny function of the
                # result so iterations cannot be parallelised/elided
                return c + 1e-12 * r.normalized_error, None

            y, _ = jax.lax.scan(body, box, None, length=n)
            return jnp.sum(y)

        return run

    def t(n):
        f = make(n)
        np.asarray(f(bbox))  # compile+warm
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(bbox))
            best = min(best, time.perf_counter() - t0)
        return best

    lo, hi = 5, 25
    per = (t(hi) - t(lo)) / (hi - lo)
    print(f"{label}: {per*1e3:.2f} ms/object", flush=True)
    return per


cfg_unfused = ProposalConfig(max_lines=L, sample_cam_roll_pitch=True)
cfg_fused = ProposalConfig(max_lines=L, sample_cam_roll_pitch=True, fused_kernel=True)
u = timeit(cfg_unfused, "unfused")
f = timeit(cfg_fused, "fused  ")
print(f"speedup: {u/f:.2f}x", flush=True)
