"""Round-4 stage attribution for detect_line_segments at VGA on TPU.

Monkeypatches one stage at a time (jax.clear_caches between runs — the
detector is called through a fresh jit each time, but keep parity with the
proposal ablation methodology).  Run: python scratch/detect_ablate_r4.py
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

import cube_slam_wu_tpu.ops.detect as det
import cube_slam_wu_tpu.ops.lines as line_ops
from cube_slam_wu_tpu.utils import io as uio

dtype = jnp.float32
gray = jnp.asarray(
    uio.load_image_gray(
        "/root/reference/detect_3d_cuboid/data/0000_rgb_raw.jpg"
    ),
    dtype,
)
cfg = det.DetectConfig()


def timed(name, n_lo=4, n_hi=32):
    jax.clear_caches()

    @jax.jit
    def run(n):
        def body(_, c):
            lines, m = det.detect_line_segments(gray + c, cfg)
            return jnp.sum(jnp.where(m, lines[:, 0], 0.0)) * 1e-42

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
    print(f"{name:<44} {dt * 1e3:8.3f} ms", flush=True)
    return dt


timed("full")

# --- no final merge ---------------------------------------------------------
orig_merge = line_ops.merge_break_lines
def fake_merge(l, m, dist, ang, minlen, max_iters=None):
    keep = m & (line_ops.line_lengths(l) > minlen)
    return l, keep
line_ops.merge_break_lines = fake_merge
det.line_ops.merge_break_lines = fake_merge
timed("no merge")
line_ops.merge_break_lines = orig_merge
det.line_ops.merge_break_lines = orig_merge

# --- support gather -> constant field --------------------------------------
orig_take = jnp.take
def probe_support():
    import cube_slam_wu_tpu.ops.detect as d

    src = open(d.__file__).read()
    return src
# stub the support gather by patching jnp.take inside detect's namespace
def fake_take(arr, idx, **kw):
    if isinstance(idx, jnp.ndarray) and idx.ndim == 3:
        # the (P, NB, S) support taps: return a constant-ish field that
        # still depends on arr so nothing upstream is dead-coded
        return jnp.broadcast_to(jnp.sum(arr) * 1e-32 + 257.0, idx.shape)
    return orig_take(arr, idx, **kw)
det.jnp = type(jnp)("jnp_patched")
for k in dir(jnp):
    try:
        setattr(det.jnp, k, getattr(jnp, k))
    except Exception:
        pass
det.jnp.take = fake_take
timed("no support gather (const field)")
det.jnp = jnp

# --- no edge-pixel top_k (use raw first-NE order) ---------------------------
orig_topk = jax.lax.top_k
def fake_topk(x, k):
    if x.ndim == 1 and x.shape[0] > 100000:
        # edge compaction: slice instead of sort (WRONG results, right cost)
        return x[:k], jnp.arange(k, dtype=jnp.int32)
    return orig_topk(x, k)
jax.lax.top_k = fake_topk
det.jax.lax.top_k = fake_topk
timed("no 307k top_k (slice)")
jax.lax.top_k = orig_topk
det.jax.lax.top_k = orig_topk

print("done", flush=True)
