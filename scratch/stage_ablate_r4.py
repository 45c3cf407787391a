"""Round-4 stage attribution for the proposal grid at the CURRENT code
(valid-compacted gathers, caps 4608/1536): monkeypatch one stage at a time
to a shape-preserving stub and slope-time the difference.  Run on TPU.

Usage: python scratch/stage_ablate_r4.py [parity|prod]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

import cube_slam_wu_tpu.ops.image as image_mod
import cube_slam_wu_tpu.ops.lines as lines_mod
import cube_slam_wu_tpu.ops.proposal as prop
from cube_slam_wu_tpu.utils import io as uio

try:
    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_bench_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

dtype = jnp.float32
base = "/root/reference/detect_3d_cuboid/data/"
gray = jnp.asarray(uio.load_image_gray(base + "0000_rgb_raw.jpg"), dtype)
edges = uio.read_number_txt(base + "edge_detection/LSD/0000_edge.txt")
L = 320
lines_np = np.zeros((L, 4))
lines_np[: len(edges)] = edges[:, :4]
mask_np = np.zeros(L, bool)
mask_np[: len(edges)] = True
lines = jnp.asarray(lines_np, dtype)
mask = jnp.asarray(mask_np)
K = jnp.asarray([[529.5, 0, 365.0], [0, 529.5, 265.0], [0, 0, 1.0]], dtype)
T = jnp.asarray(
    [
        [1, 0.0011, 0.0004, 0],
        [0, -0.3376, 0.9413, 0],
        [0.0011, -0.9413, -0.3376, 1.35],
        [0, 0, 0, 1.0],
    ],
    dtype,
)
bbox = jnp.asarray([187.0, 188.0, 201.0, 311.0], dtype)

mode = sys.argv[1] if len(sys.argv) > 1 else "parity"
if mode == "prod":
    cfg = prop.ProposalConfig(
        max_lines=L, sample_cam_roll_pitch=True, rank_margin=2e-3,
        bilinear_dist=True, nominal_skew_ratio=2.0,
    )
else:
    cfg = prop.ProposalConfig(max_lines=L, sample_cam_roll_pitch=True)


def timed(name, n_lo=4, n_hi=32):
    # detect_cuboid_single is module-level jitted: without clearing its trace
    # cache the monkeypatched stage stubs are never re-traced and every
    # ablation silently measures the ORIGINAL program (first run of this
    # script did exactly that).  clear_caches() forces a re-trace; unchanged
    # ablations still hit the persistent disk compile cache.
    jax.clear_caches()

    @jax.jit
    def run(n):
        def body(_, carry):
            res = prop.detect_cuboid_single(
                gray + carry * 1e-32, K, T, bbox, lines, mask, cfg
            )
            return jnp.sum(res.pos)

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
    print(f"{name:<38} {dt * 1e3:8.3f} ms", flush=True)
    return dt


full = timed("full")

# --- no chamfer gather (dist score -> zeros) -------------------------------
orig_dist = prop._edge_dist_score
def no_dist(dist_map, cx, cy, config_id, reweight, bilinear=False):
    return jnp.zeros(cx.shape[-1], dtype=cx.dtype)
prop._edge_dist_score = no_dist
timed("no dist gathers")
prop._edge_dist_score = orig_dist

# --- no angle score ---------------------------------------------------------
orig_angle = prop._edge_angle_score
def no_angle(ang_a, ang_b, has, cx, cy, config_id):
    return jnp.zeros(cx.shape[-1], dtype=cx.dtype)
prop._edge_angle_score = no_angle
timed("no angle score")
prop._edge_angle_score = orig_angle

# --- no corner chain (constant corners) -------------------------------------
orig_chain = prop._corner_chain
def cheap_chain(vp, c1x, c1y, g, config_id, thr):
    H = c1x.shape[0]
    cx = jnp.broadcast_to(c1x, (8, H))
    cy = jnp.broadcast_to(c1y, (8, H))
    return cx, cy, jnp.ones((H,), jnp.int32), jnp.ones((H,), bool)
prop._corner_chain = cheap_chain
timed("no corner chain")
prop._corner_chain = orig_chain

# --- no lift -----------------------------------------------------------------
orig_lift = prop._lift_soa
def no_lift(cx, cy, Kinv, Twc, plane):
    z = jnp.zeros(cx.shape[-1], dtype=cx.dtype)
    return z, z, z, z + 1.0, z + 1.0, z + 1.0
prop._lift_soa = no_lift
timed("no lift")
prop._lift_soa = orig_lift

# --- no vp support -----------------------------------------------------------
orig_vps = prop.vp_support_edge_angles
def no_vps(vps, mids, angles, m_mask, t12, t3):
    RP, Y = vps.shape[0], vps.shape[1]
    z = jnp.zeros((RP, Y, 3), dtype=mids.dtype)
    return z, z, jnp.ones((RP, Y, 3), bool)
prop.vp_support_edge_angles = no_vps
timed("no vp support")
prop.vp_support_edge_angles = orig_vps

# --- no ROI merge ------------------------------------------------------------
orig_merge = lines_mod.merge_break_lines
def fake_merge(l, m, dist, ang, minlen, max_iters=None):
    keep = m & (lines_mod.line_lengths(l) > minlen)
    return l, keep
lines_mod.merge_break_lines = fake_merge
prop.line_ops.merge_break_lines = fake_merge
timed("no ROI merge")
lines_mod.merge_break_lines = orig_merge
prop.line_ops.merge_break_lines = orig_merge

# --- no canny+EDT ------------------------------------------------------------
orig_map = image_mod.roi_canny_distance_map
def fake_map(g, l, t, r, b, low=80.0, high=200.0):
    out = orig_map(g, l, t, r, b, low=low, high=high)
    return jnp.zeros_like(out) + g[0, 0] * 1e-32
image_mod.roi_canny_distance_map = fake_map
prop.image_ops.roi_canny_distance_map = fake_map
# NOTE: stub still calls orig to learn the shape at trace time, but the
# returned VALUE only depends on one pixel -> XLA dead-codes the real map.
timed("no canny+EDT")
image_mod.roi_canny_distance_map = orig_map
prop.image_ops.roi_canny_distance_map = orig_map

# --- no argsort compaction (identity order) ---------------------------------
orig_argsort = jnp.argsort
# patch via proposal module namespace is hard (jnp.argsort global); instead
# ablate by disabling caps entirely (full gather, no sort):
import dataclasses
cfg_nocap = dataclasses.replace(cfg, dist_gather_cap=0, dist_gather_cap2=0)
cfg, cfg_nocap = cfg_nocap, cfg
timed("caps OFF (full gather, no argsort)")
cfg, cfg_nocap = cfg_nocap, cfg

# --- no fusion/rank ----------------------------------------------------------
orig_fuse = prop.fuse_normalized_scores
def no_fuse(dist_err, angle_err, valid, w, normalize):
    return jnp.where(valid, dist_err, jnp.inf), valid
prop.fuse_normalized_scores = no_fuse
timed("no fuse (rank arithmetic off)")
prop.fuse_normalized_scores = orig_fuse

print("done", flush=True)
