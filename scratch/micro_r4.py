"""Round-4 micro-bench: isolate the proposal grid's non-model costs at the
REAL shapes (parity config: Hc=9600, caps 4608/1536, VGA map, L=320 lines).

Each section is its own jit with a serializing carry and slope timing, so
relay RTT cancels.  Run on TPU:  python scratch/micro_r4.py
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

dtype = jnp.float32
Hc = 9600
CAP1, CAP2 = 4608, 1536
Hpx, Wpx = 480, 640
npx = Hpx * Wpx

rng = np.random.default_rng(0)
angle_np = rng.random(Hc).astype(np.float32)
valid_np = rng.random(Hc) < 0.35
flat_map = jnp.asarray(rng.random(npx).astype(np.float32))
cx_np = rng.uniform(0, Wpx - 1, size=(8, Hc)).astype(np.float32)
cy_np = rng.uniform(0, Hpx - 1, size=(8, Hc)).astype(np.float32)

angle_j = jnp.asarray(angle_np)
valid_j = jnp.asarray(valid_np)
cx_j = jnp.asarray(cx_np)
cy_j = jnp.asarray(cy_np)


def timed(name, make, n_lo=8, n_hi=128):
    jax.clear_caches()
    f = make()
    float(np.asarray(f(np.int32(n_lo))))
    float(np.asarray(f(np.int32(n_hi))))

    def best(n, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(np.int32(n))))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = max((best(n_hi) - best(n_lo)) / (n_hi - n_lo), 0)
    print(f"{name:<52} {dt * 1e6:9.1f} us", flush=True)
    return dt


# 1. argsort 9600 + slice (the compaction selector), x2 configs
def mk_argsort():
    @jax.jit
    def run(n):
        def body(_, c):
            key = jnp.where(valid_j, angle_j + c, angle_j.max() + 1.0)
            o1 = jnp.argsort(key, stable=True)[:CAP1]
            o2 = jnp.argsort(key, stable=True)[:CAP2]
            return (jnp.sum(o1) + jnp.sum(o2)).astype(jnp.float32) * 1e-30

        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.float32))

    return run


# 2. compaction gathers: cx[:, order], cy[:, order] for both configs
def mk_compact():
    order1 = jnp.asarray(rng.permutation(Hc)[:CAP1].astype(np.int32))
    order2 = jnp.asarray(rng.permutation(Hc)[:CAP2].astype(np.int32))

    @jax.jit
    def run(n):
        def body(_, c):
            o1 = (order1 + c) % Hc
            o2 = (order2 + c) % Hc
            s = (
                jnp.sum(cx_j[:, o1]) + jnp.sum(cy_j[:, o1])
                + jnp.sum(cx_j[:, o2]) + jnp.sum(cy_j[:, o2])
            )
            return (s * 1e-30).astype(jnp.int32)

        return jax.lax.fori_loop(0, n, body, jnp.asarray(0, jnp.int32))

    return run


# 3. the big chamfer take, (E,11,H)-shaped indices (as in _edge_dist_score)
def mk_take3d():
    idx1 = jnp.asarray(
        rng.integers(0, npx, size=(9, 11, CAP1)).astype(np.int32)
    )
    idx2 = jnp.asarray(
        rng.integers(0, npx, size=(7, 11, CAP2)).astype(np.int32)
    )

    @jax.jit
    def run(n):
        def body(_, c):
            v1 = jnp.take(flat_map, (idx1 + c) % npx)
            v2 = jnp.take(flat_map, (idx2 + c) % npx)
            return c + 1 + (jnp.sum(v1) + jnp.sum(v2) * 1e-30).astype(
                jnp.int32
            ) * 0 + 1 - 1

        return jax.lax.fori_loop(0, n, body, jnp.asarray(0, jnp.int32))

    return run


# 3b. same element count, single FLAT 1D index vector
def mk_take1d():
    elems = 9 * 11 * CAP1 + 7 * 11 * CAP2
    idx = jnp.asarray(rng.integers(0, npx, size=elems).astype(np.int32))

    @jax.jit
    def run(n):
        def body(_, c):
            v = jnp.take(flat_map, (idx + c) % npx)
            return c + 1 + (jnp.sum(v) * 1e-30).astype(jnp.int32)

        return jax.lax.fori_loop(0, n, body, jnp.asarray(0, jnp.int32))

    return run


# 4. the scatter-back .at[order].set
def mk_scatter():
    order1 = jnp.asarray(rng.permutation(Hc)[:CAP1].astype(np.int32))
    order2 = jnp.asarray(rng.permutation(Hc)[:CAP2].astype(np.int32))
    d1 = jnp.asarray(rng.random(CAP1).astype(np.float32))
    d2 = jnp.asarray(rng.random(CAP2).astype(np.float32))

    @jax.jit
    def run(n):
        def body(_, c):
            o1 = (order1 + c) % Hc
            o2 = (order2 + c) % Hc
            a = jnp.zeros((Hc,), jnp.float32).at[o1].set(d1)
            b = jnp.zeros((Hc,), jnp.float32).at[o2].set(d2)
            return ((jnp.sum(a) + jnp.sum(b)) * 1e-30).astype(jnp.int32)

        return jax.lax.fori_loop(0, n, body, jnp.asarray(0, jnp.int32))

    return run


# 5. angle score arithmetic (8 atan2 over Hc + reductions)
def mk_atan2():
    @jax.jit
    def run(n):
        def body(_, c):
            s = jnp.zeros(Hc, jnp.float32)
            for k in range(8):
                s = s + jnp.arctan2(cy_j[(k + 1) % 8] + c, cx_j[k])
            return jnp.sum(s) * 1e-30

        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.float32))

    return run


# 6. merge_break_lines on REAL fixture lines (the while_loop)
def mk_merge():
    from cube_slam_wu_tpu.ops import lines as line_ops
    from cube_slam_wu_tpu.utils import io as uio

    base = "/root/reference/detect_3d_cuboid/data/"
    edges = uio.read_number_txt(base + "edge_detection/LSD/0000_edge.txt")
    L = 320
    ln = np.zeros((L, 4), np.float32)
    ln[: len(edges)] = edges[:, :4]
    mk = np.zeros(L, bool)
    mk[: len(edges)] = True
    ln_j = jnp.asarray(line_ops.align_left_right(jnp.asarray(ln)))
    mk_j = jnp.asarray(mk)

    @jax.jit
    def run(n):
        def body(_, c):
            out_l, out_m = line_ops.merge_break_lines(
                ln_j + c * 1e-32, mk_j, 20.0, 5.0, 30.0
            )
            return jnp.sum(jnp.where(out_m, out_l[:, 0], 0.0)) * 1e-30

        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.float32))

    return run


# 7. EDT+Canny ROI map at fixture box
def mk_edt():
    from cube_slam_wu_tpu.ops import image as image_mod
    from cube_slam_wu_tpu.utils import io as uio

    gray = jnp.asarray(
        uio.load_image_gray(
            "/root/reference/detect_3d_cuboid/data/0000_rgb_raw.jpg"
        ),
        dtype,
    )

    @jax.jit
    def run(n):
        def body(_, c):
            m = image_mod.roi_canny_distance_map(
                gray + c * 1e-32,
                jnp.int32(177), jnp.int32(178), jnp.int32(398),
                jnp.int32(509),
            )
            return jnp.sum(m) * 1e-30

        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, dtype))

    return run


timed("argsort 9600 x2 + slice", mk_argsort)
timed("compaction gathers cx/cy[:, order] (98k elems)", mk_compact)
timed("chamfer take, (E,11,cap) idx (574k elems)", mk_take3d, n_lo=4, n_hi=64)
timed("chamfer take, flat idx (574k elems)", mk_take1d, n_lo=4, n_hi=64)
timed("scatter .at[order].set x2", mk_scatter)
timed("8x atan2 over Hc", mk_atan2)
timed("merge_break_lines (fixture, while_loop)", mk_merge, n_lo=4, n_hi=64)
timed("roi_canny_distance_map (fixture ROI)", mk_edt, n_lo=4, n_hi=64)
print("done", flush=True)
