"""TPU-native line-segment detection.

Replaces the reference's sequential detectors — EDLine's anchor/edge-chaining
(line_lbd/libs/binary_descriptor.cpp:1583-2875) and von-Gioi LSD's region
growing (line_lbd/libs/lsd.cpp) — with a fully-batched orientation-aware
Hough formulation that maps onto the VPU with no data-dependent control flow:

  1. Gaussian blur + Sobel gradients (matching the reference pyramid base,
     binary_descriptor.cpp:352-374),
  2. non-maximum-suppressed edge mask with a gradient threshold,
  3. gradient-weighted votes into a (normal-angle, offset) Hough accumulator —
     each pixel votes only near its own gradient orientation, which is what
     makes the transform segment-friendly (one scatter-add),
  4. 3x3 peak NMS + top-P peak extraction,
  5. per-peak inlier binning along the line direction and gap-tolerant run
     extraction (batched 1D scans over a (P, n_bins) occupancy raster) —
     the parallel analogue of LSD's region growing / EDLine's chain walking,
  6. duplicate removal + collinear merging (ops.lines.merge_break_lines).

Correctness target is behavioural parity with the reference detectors on
their own fixtures (SURVEY.md section 7.1): recall of long segments,
validated in tests/test_detect.py.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp

from cube_slam_wu_tpu.ops import image as image_ops
from cube_slam_wu_tpu.ops import lines as line_ops


@dataclasses.dataclass(frozen=True)
class DetectConfig:
    n_theta: int = 180  # normal-angle bins over [0, pi)
    rho_bin: float = 1.5  # px per offset bin
    t_bin: float = 2.0  # px per along-line bin
    grad_threshold: float = 30.0  # on |gx|+|gy| of the blurred image
    n_peaks: int = 224  # Hough peaks examined
    runs_per_peak: int = 6  # segments extracted per peak
    max_runs: int = 32  # run-id capacity per peak
    inlier_rho_tol: float = 1.8  # px distance to the peak line
    inlier_angle_tol_deg: float = 11.0
    min_inliers: float = 7.0  # occupied bins per run (~14 px)
    gap_bins: int = 2  # tolerated empty bins inside a run
    merge_dist: float = 8.0
    merge_angle_deg: float = 5.0
    min_length: float = 15.0  # line_lbd_detect.line_length_thres analogue
    max_merge_iters: int = 400
    max_edge_pixels: int = 32768  # compaction cap for per-peak work


def gaussian_blur5(gray: jnp.ndarray, sigma: float = 1.0) -> jnp.ndarray:
    """5x5 Gaussian blur, replicate border (cv::GaussianBlur(Size(5,5),1))."""
    xs = jnp.arange(-2, 3, dtype=gray.dtype)
    k = jnp.exp(-(xs**2) / (2.0 * sigma**2))
    k = k / jnp.sum(k)

    def conv1(a, axis):
        idx = jnp.clip(
            jnp.arange(a.shape[axis])[:, None] + jnp.arange(-2, 3)[None, :],
            0,
            a.shape[axis] - 1,
        )
        g = jnp.take(a, idx, axis=axis)
        return jnp.tensordot(g, k, axes=[[axis + 1], [0]])

    return conv1(conv1(gray, 0), 1)


def _angle_dist_pi(a, b):
    d = jnp.abs(a - b)
    d = jnp.mod(d, math.pi)
    return jnp.minimum(d, math.pi - d)


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect_line_segments(gray: jnp.ndarray, cfg: DetectConfig = DetectConfig()):
    """Detect line segments.

    Returns (lines (K, 4) [x1 y1 x2 y2] left-to-right, mask (K,)) with
    K = n_peaks * runs_per_peak.
    """
    dtype = gray.dtype
    H, W = gray.shape
    g = gaussian_blur5(gray)
    gx, gy = image_ops.sobel3(g)
    mag = jnp.abs(gx) + jnp.abs(gy)
    keep = image_ops._nms(mag, gx, gy) & (mag > cfg.grad_threshold)

    # normal (gradient) angle folded to [0, pi)
    psi = jnp.mod(jnp.arctan2(gy, gx), math.pi)

    # ---- compact to the strongest edge pixels ------------------------------
    # (typically ~10% of the image passes NMS; all per-peak work below is
    # O(edge pixels), which matters because TPU scatters are expensive)
    NE = min(cfg.max_edge_pixels, H * W)
    score_flat = jnp.where(keep, mag, 0.0).reshape(-1)
    top_w, top_pix = jax.lax.top_k(score_flat, NE)
    flat_w = top_w
    flat_y = (top_pix // W).astype(dtype)
    flat_x = (top_pix % W).astype(dtype)
    flat_psi = psi.reshape(-1)[top_pix]
    edge_valid = flat_w > 0

    # ---- Hough accumulation (votes at own angle bin +-1) -------------------
    NT = cfg.n_theta
    diag = math.hypot(H, W)
    NR = int(2 * diag / cfg.rho_bin) + 2
    rho_off = diag  # shift so rho >= 0

    tbin0 = jnp.floor(flat_psi / (math.pi / NT)).astype(jnp.int32) % NT

    acc = jnp.zeros((NT, NR), dtype)
    for dt in (-1, 0, 1):
        tb = (tbin0 + dt) % NT
        theta = (tb.astype(dtype) + 0.5) * (math.pi / NT)
        rho = flat_x * jnp.cos(theta) + flat_y * jnp.sin(theta)
        rb = jnp.clip(((rho + rho_off) / cfg.rho_bin).astype(jnp.int32), 0, NR - 1)
        acc = acc.at[tb, rb].add(flat_w)

    # ---- peak extraction: 3x3 NMS then top-P -------------------------------
    def max3(a, axis, wrap):
        lo = jnp.roll(a, 1, axis)
        hi = jnp.roll(a, -1, axis)
        if not wrap:
            # non-wrapping axis: neighbours beyond the edge do not exist
            idx = [slice(None)] * a.ndim
            idx[axis] = slice(0, 1)
            lo = lo.at[tuple(idx)].set(0.0)
            idx[axis] = slice(-1, None)
            hi = hi.at[tuple(idx)].set(0.0)
        return jnp.maximum(a, jnp.maximum(lo, hi))

    neigh = max3(max3(acc, 0, wrap=True), 1, wrap=False)
    is_peak = (acc >= neigh) & (acc > 0)
    peak_score = jnp.where(is_peak, acc, 0.0)
    P = cfg.n_peaks
    top_vals, top_idx = jax.lax.top_k(peak_score.reshape(-1), P)
    pk_t = top_idx // NR
    pk_r = top_idx % NR
    pk_valid = top_vals > 0
    theta_p = (pk_t.astype(dtype) + 0.5) * (math.pi / NT)  # (P,)
    rho_p = (pk_r.astype(dtype) + 0.5) * cfg.rho_bin - rho_off

    # ---- per-peak inlier raster along the line ----------------------------
    cos_p, sin_p = jnp.cos(theta_p), jnp.sin(theta_p)
    # per-peak work runs over the compacted edge-pixel list (flat_* above)
    NB = int(2 * diag / cfg.t_bin) + 2
    t_off = diag

    # scatter per peak: occupancy[p, b] += w for inliers of peak p,
    # chunked over peaks to bound the (CH, n_edge_pixels) intermediates
    CH = 32  # peaks per chunk

    def chunk_body(carry, pk):
        th_c, rh_c = pk  # (CH,)
        cs, sn = jnp.cos(th_c), jnp.sin(th_c)
        d = (
            flat_x[None, :] * cs[:, None]
            + flat_y[None, :] * sn[:, None]
            - rh_c[:, None]
        )
        ang_ok = _angle_dist_pi(flat_psi[None, :], th_c[:, None]) < math.radians(
            cfg.inlier_angle_tol_deg
        )
        inl = (jnp.abs(d) < cfg.inlier_rho_tol) & ang_ok & edge_valid[None, :]
        t = -flat_x[None, :] * sn[:, None] + flat_y[None, :] * cs[:, None]
        tb = jnp.clip(((t + t_off) / cfg.t_bin).astype(jnp.int32), 0, NB - 1)
        occ = jnp.zeros((CH, NB), dtype)
        pidx = jnp.broadcast_to(jnp.arange(CH)[:, None], tb.shape)
        occ = occ.at[pidx.reshape(-1), tb.reshape(-1)].add(
            jnp.where(inl, flat_w[None, :], 0.0).reshape(-1)
        )
        # also accumulate exact min/max t per bin for endpoint refinement
        return carry, occ

    n_chunks = P // CH
    _, occ_chunks = jax.lax.scan(
        chunk_body,
        None,
        (theta_p.reshape(n_chunks, CH), rho_p.reshape(n_chunks, CH)),
    )
    occ = occ_chunks.reshape(P, NB)  # weighted occupancy per along-line bin

    # ---- gap-tolerant run extraction on the (P, NB) raster ----------------
    occb = occ > 0
    # close gaps of up to gap_bins via 1D dilation then logical AND trimming
    closed = occb
    for _ in range(cfg.gap_bins):
        closed = closed | jnp.roll(closed, 1, -1) | jnp.roll(closed, -1, -1)
    # runs of `closed`; trim later using occb
    prev = jnp.concatenate([jnp.zeros_like(closed[:, :1]), closed[:, :-1]], axis=1)
    run_start = closed & ~prev
    run_id = jnp.cumsum(run_start, axis=1) * closed  # 1-based ids, 0 = background
    run_id = jnp.minimum(run_id, cfg.max_runs)

    bin_t = (jnp.arange(NB, dtype=dtype) + 0.5) * cfg.t_bin - t_off

    def per_peak(run_id_p, occb_p, occ_p):
        ids = run_id_p  # (NB,)
        one = jnp.where(occb_p, 1.0, 0.0)
        seg_ids = jnp.arange(1, cfg.max_runs + 1)
        member = (ids[None, :] == seg_ids[:, None]) & occb_p[None, :]  # (R, NB)
        counts = jnp.sum(member, axis=1)
        weights = jnp.sum(jnp.where(member, occ_p[None, :], 0.0), axis=1)
        tmin = jnp.min(jnp.where(member, bin_t[None, :], jnp.inf), axis=1)
        tmax = jnp.max(jnp.where(member, bin_t[None, :], -jnp.inf), axis=1)
        del one
        # pick the longest runs
        S = cfg.runs_per_peak
        sel = jax.lax.top_k(counts.astype(dtype), S)[1]
        return counts[sel], weights[sel], tmin[sel], tmax[sel]

    counts, weights, tmin, tmax = jax.vmap(per_peak)(run_id, occb, occ)

    ok = (counts >= cfg.min_inliers) & pk_valid[:, None] & jnp.isfinite(tmin) & jnp.isfinite(tmax)
    # endpoints: p = rho*(cos,sin) + t*(-sin,cos); extend to bin edges
    ex = -sin_p[:, None]
    ey = cos_p[:, None]
    bx = rho_p[:, None] * cos_p[:, None]
    by = rho_p[:, None] * sin_p[:, None]
    t0 = tmin - 0.5 * cfg.t_bin
    t1 = tmax + 0.5 * cfg.t_bin
    x1 = bx + t0 * ex
    y1 = by + t0 * ey
    x2 = bx + t1 * ex
    y2 = by + t1 * ey
    segs = jnp.stack([x1, y1, x2, y2], axis=-1).reshape(-1, 4)
    seg_mask = ok.reshape(-1)
    seg_weight = jnp.where(seg_mask, weights.reshape(-1), 0.0)
    segs = jnp.where(seg_mask[:, None], segs, 0.0)

    # one-shot dedupe: drop a segment if a strictly stronger, nearly-parallel
    # segment overlaps it (adjacent Hough peaks produce near-duplicates)
    ang = jnp.arctan2(segs[:, 3] - segs[:, 1], segs[:, 2] - segs[:, 0])
    dvec = segs[:, 2:4] - segs[:, 0:2]
    dlen = jnp.linalg.norm(dvec, axis=-1) + 1e-9
    dunit = dvec / dlen[:, None]
    nunit = jnp.stack([-dunit[:, 1], dunit[:, 0]], axis=-1)

    rel_a = segs[None, :, 0:2] - segs[:, None, 0:2]  # head_j - head_i
    rel_b = segs[None, :, 2:4] - segs[:, None, 0:2]
    perp = jnp.maximum(
        jnp.abs(jnp.einsum("ijk,ik->ij", rel_a, nunit)),
        jnp.abs(jnp.einsum("ijk,ik->ij", rel_b, nunit)),
    )
    ta = jnp.einsum("ijk,ik->ij", rel_a, dunit) / dlen[:, None]
    tb = jnp.einsum("ijk,ik->ij", rel_b, dunit) / dlen[:, None]
    ov = jnp.minimum(jnp.maximum(ta, tb), 1.0) - jnp.maximum(jnp.minimum(ta, tb), 0.0)
    d_ang = jnp.abs(ang[:, None] - ang[None, :])
    d_ang = jnp.minimum(jnp.mod(d_ang, math.pi), math.pi - jnp.mod(d_ang, math.pi))
    dominated_by = (
        (perp < 2.0)
        & (ov > 0.6)
        & (d_ang < math.radians(3.0))
        & (
            (seg_weight[None, :] > seg_weight[:, None])
            | (
                (seg_weight[None, :] == seg_weight[:, None])
                & (jnp.arange(segs.shape[0])[None, :] < jnp.arange(segs.shape[0])[:, None])
            )
        )
        & seg_mask[None, :]
    )
    seg_mask = seg_mask & ~jnp.any(dominated_by, axis=1)

    segs = line_ops.align_left_right(segs)
    merged, merged_mask = line_ops.merge_break_lines(
        segs,
        seg_mask,
        cfg.merge_dist,
        cfg.merge_angle_deg,
        cfg.min_length,
        max_iters=cfg.max_merge_iters,
    )
    return merged, merged_mask
