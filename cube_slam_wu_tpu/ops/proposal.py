"""Vanishing-point cuboid proposal engine as one batched hypothesis grid.

TPU-first re-design of the reference's per-detection proposal loop
(detect_3d_cuboid/src/box_proposal_detail.cpp:65-861 and the geometry/scoring
helpers in object_3d_util.cpp).  The reference iterates
(camera roll x pitch x object yaw x top-edge sample x configuration) with ~10
early-`continue` guard points; here the whole grid is materialised as a
fixed-shape tensor program: every hypothesis's closed-form corner chain is
computed unconditionally and the guards become a validity mask, so the
entire grid maps onto the VPU/MXU with no data-dependent control flow.

Pipeline per 2D detection:
  1. line filtering + greedy merge (ops.lines),
  2. Canny + exact EDT distance map on the expanded ROI (ops.image),
  3. vanishing points per (roll, pitch, yaw) sample,
  4. VP-supported image-edge angles (batched over the padded line set),
  5. corner chains + validity for both configurations,
  6. chamfer distance + VP-alignment angle scoring,
  7. best-2/3 set-intersection score fusion (fuse_normalize_scores_v2
     semantics via rank arithmetic instead of partial sorts),
  8. 2D->3D lifting of every hypothesis through the ground/wall planes,
  9. skew-penalised final ranking -> best cuboid.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cube_slam_wu_tpu.core import camera as cam
from cube_slam_wu_tpu.core import rotations as rotu
from cube_slam_wu_tpu.ops import image as image_ops
from cube_slam_wu_tpu.ops import lines as line_ops


# ---------------------------------------------------------------------------
# configuration (static under jit)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ProposalConfig:
    """Static knobs mirroring the `detect_3d_cuboid` member flags
    (detect_3d_cuboid.h:95-117) and the constants at
    box_proposal_detail.cpp:101-110."""

    max_lines: int = 128
    max_top_samples: int = 24
    n_yaw: int = 16  # linespace(-45deg, +45deg, 6deg) inclusive
    sample_cam_roll_pitch: bool = False
    n_roll_pitch: int = 5  # linespace(-6deg, +6deg, 3deg) when sampling
    consider_config_1: bool = True
    consider_config_2: bool = True
    shorted_edge_thre: float = 20.0
    vp12_edge_angle_thre_deg: float = 15.0
    vp3_edge_angle_thre_deg: float = 10.0
    weight_vp_angle: float = 0.8
    whether_normalize_two_errors: bool = True
    reweight_edge_distance: bool = True
    nominal_skew_ratio: float = 1.0
    max_cut_skew: float = 3.0
    weight_skew_error: float = 1.5
    canny_low: float = 80.0
    canny_high: float = 200.0
    pre_merge_dist_thre: float = 20.0
    pre_merge_angle_thre_deg: float = 5.0
    edge_length_threshold: float = 30.0

    @property
    def rp_count(self) -> int:
        return self.n_roll_pitch if self.sample_cam_roll_pitch else 1


class ProposalResult(NamedTuple):
    """Best cuboid proposal for one 2D detection (fields mirror the reference
    `cuboid` struct, detect_3d_cuboid.h:20-42)."""

    valid: jnp.ndarray  # () bool
    pos: jnp.ndarray  # (3,)
    rotY: jnp.ndarray  # ()
    scale: jnp.ndarray  # (3,) half extents
    box_config_type: jnp.ndarray  # (2,) [config_id, vp1_position]
    corners_2d: jnp.ndarray  # (2, 8) reordered to the universal layout
    corners_3d_world: jnp.ndarray  # (3, 8)
    edge_distance_error: jnp.ndarray
    edge_angle_error: jnp.ndarray
    normalized_error: jnp.ndarray
    skew_ratio: jnp.ndarray
    camera_roll_delta: jnp.ndarray
    camera_pitch_delta: jnp.ndarray


# ---------------------------------------------------------------------------
# small geometry helpers (vectorised over leading dims)
# ---------------------------------------------------------------------------


def _hit_vertical(vp, pt, x0, y_lo, y_hi):
    """Ray vp->pt hitting the vertical segment x=x0, y in [y_lo, y_hi]
    (seg_hit_boundary, object_3d_util.cpp:309-353)."""
    d = pt - vp
    lam = (x0 - vp[..., 0]) / d[..., 0]
    y = vp[..., 1] + lam * d[..., 1]
    ok = (lam >= 0) & (y_lo <= y) & (y <= y_hi)
    hit = jnp.stack([jnp.broadcast_to(x0, y.shape), y], axis=-1)
    return hit, ok


def _hit_horizontal(vp, pt, y0, x_lo, x_hi):
    d = pt - vp
    lam = (y0 - vp[..., 1]) / d[..., 1]
    x = vp[..., 0] + lam * d[..., 0]
    ok = (lam >= 0) & (x_lo <= x) & (x <= x_hi)
    hit = jnp.stack([x, jnp.broadcast_to(y0, x.shape)], axis=-1)
    return hit, ok


def _intersect(p1s, p1e, p2s, p2e):
    """Infinite-line intersection (lineSegmentIntersect,
    object_3d_util.cpp:357-382)."""
    d1 = p1e - p1s
    d2 = p2e - p2s
    d13 = p1s - p2s
    denom = d2[..., 1] * d1[..., 0] - d2[..., 0] * d1[..., 1]
    u_a = (d2[..., 0] * d13[..., 1] - d2[..., 1] * d13[..., 0]) / denom
    return p1s + u_a[..., None] * d1


def _inside(pt, tl_x, tl_y, br_x, br_y):
    return (
        (tl_x <= pt[..., 0])
        & (pt[..., 0] <= br_x)
        & (tl_y <= pt[..., 1])
        & (pt[..., 1] <= br_y)
    )


def _norm_ge(a, b, thr):
    return jnp.linalg.norm(a - b, axis=-1) >= thr


def vanishing_points(KinvR: jnp.ndarray, yaw: jnp.ndarray) -> jnp.ndarray:
    """VPs of the object x/y/z axes at the sampled yaw: (..., 3 vps, 2)
    (getVanishingPoints, object_3d_util.cpp:928-937)."""
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    zeros = jnp.zeros_like(cy)
    ones = jnp.ones_like(cy)
    dirs = jnp.stack(
        [
            jnp.stack([cy, sy, zeros], axis=-1),
            jnp.stack([-sy, cy, zeros], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )  # (..., 3, 3) rows are directions
    proj = jnp.einsum("...ij,...vj->...vi", KinvR, dirs)
    return proj[..., :2] / proj[..., 2:3]


def vp_support_edge_angles(
    vps: jnp.ndarray,
    mids: jnp.ndarray,
    angles: jnp.ndarray,
    mask: jnp.ndarray,
    thr12_deg: float,
    thr3_deg: float,
):
    """For each VP find the two angular-boundary supporting image edges
    (VP_support_edge_infos, object_3d_util.cpp:548-619).

    vps (..., 3, 2); mids (L, 2); angles (L,); mask (L,).
    Returns (ang_a, ang_b, has): each (..., 3).
    """
    raw = jnp.arctan2(
        mids[..., 1] - vps[..., :, None, 1], mids[..., 0] - vps[..., :, None, 0]
    )  # (..., 3, L)
    norm = rotu.normalize_to_pi_half(raw)
    diff = rotu.angle_dist_pi(angles, norm)
    thr = jnp.deg2rad(
        jnp.asarray([thr12_deg, thr12_deg, thr3_deg], dtype=diff.dtype)
    )
    inlier = mask & (diff < thr[..., :, None])  # (..., 3, L)
    has = jnp.any(inlier, axis=-1)

    first = jnp.argmax(inlier, axis=-1)  # first inlier index per vp
    base = jnp.take_along_axis(raw, first[..., None], axis=-1)[..., 0]
    # smooth_jump_angles (object_3d_util.cpp:278-302)
    shifted = raw
    shifted = jnp.where(raw - base[..., None] < -jnp.pi, raw + 2 * jnp.pi, shifted)
    shifted = jnp.where(raw - base[..., None] > jnp.pi, raw - 2 * jnp.pi, shifted)

    neg_inf = jnp.asarray(-jnp.inf, dtype=shifted.dtype)
    pos_inf = jnp.asarray(jnp.inf, dtype=shifted.dtype)
    id_max = jnp.argmax(jnp.where(inlier, shifted, neg_inf), axis=-1)
    id_min = jnp.argmin(jnp.where(inlier, shifted, pos_inf), axis=-1)
    ang_a = angles[id_max]
    ang_b = angles[id_min]
    return ang_a, ang_b, has


# ---------------------------------------------------------------------------
# corner chain
# ---------------------------------------------------------------------------


class _BoxGeom(NamedTuple):
    """Traced scalars describing one detection box (all float)."""

    left: jnp.ndarray
    top: jnp.ndarray
    right: jnp.ndarray
    down_expan: jnp.ndarray  # bottom incl. height expansion
    exp_left: jnp.ndarray  # expanded (distmap) ROI
    exp_top: jnp.ndarray
    exp_right: jnp.ndarray
    exp_down: jnp.ndarray
    diag: jnp.ndarray


def _corner_chain(vps, c1, g: _BoxGeom, config_id: int, thr: float):
    """Closed-form corners 2..8 for one configuration
    (box_proposal_detail.cpp:407-630).  All args broadcast; returns
    (corners (..., 8, 2), vp1_pos (...,), valid (...,))."""
    vp1, vp2, vp3 = vps[..., 0, :], vps[..., 1, :], vps[..., 2, :]

    c2_r, ok_r = _hit_vertical(vp1, c1, g.right, g.top, g.down_expan)
    c2_l, ok_l = _hit_vertical(vp1, c1, g.left, g.top, g.down_expan)
    vp1_pos = jnp.where(ok_r, 1, jnp.where(ok_l, 2, 0))
    c2 = jnp.where(ok_r[..., None], c2_r, c2_l)
    valid = (vp1_pos > 0) & _norm_ge(c1, c2, thr)

    x_opp = jnp.where(vp1_pos == 1, g.left, g.right)
    if config_id == 1:
        c4, ok4 = _hit_vertical(vp2, c1, x_opp, g.top, g.down_expan)
        valid &= ok4 & _norm_ge(c1, c4, thr)
        c3 = _intersect(vp2, c2, vp1, c4)
        valid &= _inside(c3, g.left, g.top, g.right, g.down_expan)
        valid &= _norm_ge(c3, c4, thr) & _norm_ge(c3, c2, thr)
    else:
        c3, ok3 = _hit_vertical(vp2, c2, x_opp, g.top, g.down_expan)
        valid &= ok3 & _norm_ge(c2, c3, thr)
        c4 = _intersect(vp1, c3, vp2, c1)
        valid &= _inside(c4, g.left, g.exp_top, g.right, g.exp_down)
        valid &= _norm_ge(c3, c4, thr) & _norm_ge(c4, c1, thr)

    c5, ok5 = _hit_horizontal(vp3, c3, g.down_expan, g.left, g.right)
    valid &= ok5 & _norm_ge(c3, c5, thr)
    c6 = _intersect(vp2, c5, vp3, c2)
    valid &= _inside(c6, g.exp_left, g.exp_top, g.exp_right, g.exp_down)
    valid &= _norm_ge(c6, c2, thr) & _norm_ge(c6, c5, thr)
    c7 = _intersect(vp1, c6, vp3, c1)
    valid &= _inside(c7, g.exp_left, g.exp_top, g.exp_right, g.exp_down)
    valid &= _norm_ge(c7, c1, thr) & _norm_ge(c7, c6, thr)
    c8 = _intersect(vp1, c5, vp2, c7)
    valid &= _inside(c8, g.exp_left, g.exp_top, g.exp_right, g.exp_down)
    valid &= _norm_ge(c8, c4, thr) & _norm_ge(c8, c5, thr) & _norm_ge(c8, c7, thr)

    pts = [c1, c2, c3, c4, c5, c6, c7, c8]
    shape = jnp.broadcast_shapes(*[p.shape for p in pts])
    corners = jnp.stack([jnp.broadcast_to(p, shape) for p in pts], axis=-2)
    # NaN hygiene: degenerate intersections produce NaN/inf coords; those
    # hypotheses always fail an _inside check, but scrub values so downstream
    # gathers stay in-range.
    corners = jnp.where(jnp.isfinite(corners), corners, 0.0)
    return corners, vp1_pos, valid


# visible-edge tables (box_proposal_detail.cpp:641-668), 0-based, padded to 9
_EDGES_CFG1 = ((0, 1), (1, 2), (2, 3), (3, 0), (1, 5), (2, 4), (3, 7), (4, 7), (4, 5))
_W_CFG1 = (1.0,) * 9
_EDGES_CFG2 = ((0, 1), (1, 2), (2, 3), (3, 0), (1, 5), (2, 4), (4, 5), (0, 0), (0, 0))
_W_CFG2 = (1.0, 1.0, 1.0, 1.0, 1.5, 1.5, 2.0, 0.0, 0.0)

# VP alignment edge tables (box_proposal_detail.cpp:651,665), 0-based:
# per VP, two edges, each (corner_a, corner_b)
_VP_EDGES_CFG1 = (((0, 1), (7, 4)), ((3, 0), (4, 5)), ((3, 7), (1, 5)))
_VP_EDGES_CFG2 = (((0, 1), (2, 3)), ((3, 0), (4, 5)), ((2, 4), (1, 5)))


def _edge_dist_score(dist_map, corners, config_id: int, reweight: bool):
    """Chamfer distance of 11 samples per visible edge
    (box_edge_sum_dists, object_3d_util.cpp:622-667)."""
    edges = _EDGES_CFG1 if config_id == 1 else _EDGES_CFG2
    weights = _W_CFG1 if (config_id == 1 or not reweight) else _W_CFG2
    if config_id == 2 and not reweight:
        weights = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0)
    ia = jnp.asarray([e[0] for e in edges])
    ib = jnp.asarray([e[1] for e in edges])
    w = jnp.asarray(weights, dtype=corners.dtype)
    pa = corners[..., ia, :]  # (..., 9, 2)
    pb = corners[..., ib, :]
    frac = jnp.linspace(0.0, 1.0, 11).astype(corners.dtype)  # k/10
    # sample_pt = frac*pa + (1-frac)*pb  (reference orders from corner2 to 1)
    pts = frac[:, None] * pa[..., None, :] + (1.0 - frac[:, None]) * pb[..., None, :]
    h, wimg = dist_map.shape[-2:]
    xi = jnp.clip(jnp.floor(pts[..., 0]).astype(jnp.int32), 0, wimg - 1)
    yi = jnp.clip(jnp.floor(pts[..., 1]).astype(jnp.int32), 0, h - 1)
    d = dist_map[yi, xi]  # (..., 9, 11)
    return jnp.sum(d * w[..., :, None], axis=(-1, -2))


def _edge_angle_score(ang_a, ang_b, has, corners, config_id: int):
    """VP alignment angle error (box_edge_alignment_angle_error,
    object_3d_util.cpp:670-723).  ang_a/ang_b/has: (..., 3)."""
    table = _VP_EDGES_CFG1 if config_id == 1 else _VP_EDGES_CFG2
    not_found = jnp.asarray(30.0 / 180.0 * math.pi * 2.0, dtype=corners.dtype)
    total = jnp.zeros(corners.shape[:-2], dtype=corners.dtype)
    for vp_id in range(3):
        per_vp = jnp.zeros_like(total)
        for (a_id, b_id) in table[vp_id]:
            pa = corners[..., a_id, :]
            pb = corners[..., b_id, :]
            edge_ang = rotu.normalize_to_pi_half(
                jnp.arctan2(pb[..., 1] - pa[..., 1], pb[..., 0] - pa[..., 0])
            )
            d = jnp.minimum(
                rotu.angle_dist_pi(edge_ang, ang_a[..., vp_id]),
                rotu.angle_dist_pi(edge_ang, ang_b[..., vp_id]),
            )
            per_vp = per_vp + d
        total = total + jnp.where(has[..., vp_id], per_vp, not_found)
    return total


# ---------------------------------------------------------------------------
# score fusion (fuse_normalize_scores_v2, object_3d_util.cpp:726-837)
# ---------------------------------------------------------------------------


def _rank(values, valid):
    """Ascending rank among valid entries (ties broken by index, matching a
    stable partial sort); invalid entries rank last."""
    n = values.shape[0]
    big = jnp.where(valid, values, jnp.inf)
    order = jnp.argsort(big, stable=True)
    ranks = jnp.zeros(n, dtype=jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return ranks


def fuse_normalized_scores(dist_err, angle_err, valid, weight_vp_angle, normalize):
    """Best-2/3 intersection + min-max fusion; returns (scores, kept_mask)
    with +inf outside the kept set."""
    dtype = dist_err.dtype
    n = jnp.sum(valid)
    d = jnp.where(valid, dist_err, jnp.inf)
    a = jnp.where(valid, angle_err, jnp.inf)

    breaking = jnp.round(n.astype(dtype) / 3.0 * 2.0).astype(jnp.int32)
    keep_count = jnp.maximum(breaking - 1, 1)
    rd = _rank(d, valid)
    ra = _rank(a, valid)
    keep_d = rd < keep_count
    keep_a = ra < keep_count

    a_sorted = jnp.sort(a)
    idx_hi = jnp.clip(breaking - 1, 0, a.shape[0] - 1)
    idx_lo = jnp.clip(breaking - 2, 0, a.shape[0] - 1)
    use_angle = a_sorted[idx_hi] > a_sorted[idx_lo]

    kept_big = keep_d & jnp.where(use_angle, keep_a, True)
    kept = jnp.where(n > 4, kept_big, valid)

    def masked_minmax(x):
        lo = jnp.min(jnp.where(kept, x, jnp.inf))
        hi = jnp.max(jnp.where(kept, x, -jnp.inf))
        return lo, hi

    d_lo, d_hi = masked_minmax(d)
    a_lo, a_hi = masked_minmax(a)
    n_kept = jnp.sum(kept)

    d_span = jnp.where(d_hi > d_lo, d_hi - d_lo, 1.0)
    a_span = jnp.where(a_hi > a_lo, a_hi - a_lo, 1.0)
    d_n = (d - d_lo) / d_span
    a_n = jnp.where(a_hi > a_lo, (a - a_lo) / a_span, a)
    w = weight_vp_angle
    comb_norm = (d_n + w * a_n) / (1.0 + w)
    comb_raw = (d + w * a) / (1.0 + w)
    do_norm = jnp.logical_and(normalize, n_kept > 1)
    scores = jnp.where(do_norm, comb_norm, comb_raw)
    return jnp.where(kept, scores, jnp.inf), kept


# ---------------------------------------------------------------------------
# 2D -> 3D lifting (change_2d_corner_to_3d_object, object_3d_util.cpp:941-1011)
# ---------------------------------------------------------------------------


def lift_to_3d(corners, T_wc, K_inv, ground_plane_sensor):
    """corners (..., 8, 2) -> (pos(...,3), scale(...,3)).  Broadcasts over
    leading dims; T_wc/K_inv/plane must broadcast against corners' batch."""
    bottom = jnp.swapaxes(corners[..., 4:8, :], -1, -2)  # (..., 2, 4)
    gnd = cam.plane_hits_3d(T_wc, K_inv, ground_plane_sensor, bottom)  # (..., 3, 4)
    length_half = 0.5 * jnp.linalg.norm(gnd[..., :, 0] - gnd[..., :, 3], axis=-1)
    width_half = 0.5 * jnp.linalg.norm(gnd[..., :, 0] - gnd[..., :, 1], axis=-1)
    wall_w = cam.wall_plane_equation(gnd[..., :, 0], gnd[..., :, 1])
    wall_s = jnp.einsum("...ji,...j->...i", T_wc, wall_w)
    top_px = jnp.swapaxes(corners[..., 1:2, :], -1, -2)  # corner 2, (..., 2, 1)
    top3d = cam.plane_hits_3d(T_wc, K_inv, wall_s, top_px)
    height_half = 0.5 * top3d[..., 2, 0]
    pos = jnp.stack(
        [
            jnp.mean(gnd[..., 0, :], axis=-1),
            jnp.mean(gnd[..., 1, :], axis=-1),
            height_half,
        ],
        axis=-1,
    )
    scale = jnp.stack([length_half, width_half, height_half], axis=-1)
    return pos, scale


# corner reorder to the universal cuboid layout
# (change_2d_corner_to_3d_object, object_3d_util.cpp:995-1007), 0-based
_REORDER_VP_LEFT = (5, 4, 7, 6, 1, 2, 3, 0)
_REORDER_VP_RIGHT = (4, 5, 6, 7, 2, 1, 0, 3)


def _similarity_corners_3d(pos, rotY, scale):
    """compute3D_BoxCorner via the yaw-only similarity transform
    (object_3d_util.cpp:15-73): (..., 3, 8)."""
    c, s = jnp.cos(rotY), jnp.sin(rotY)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    R = jnp.stack([c, -s, zeros, s, c, zeros, zeros, zeros, ones], axis=-1).reshape(
        rotY.shape + (3, 3)
    )
    body = jnp.asarray(
        [
            [1.0, 1, -1, -1, 1, 1, -1, -1],
            [1.0, -1, -1, 1, 1, -1, -1, 1],
            [-1.0, -1, -1, -1, 1, 1, 1, 1],
        ],
        dtype=pos.dtype,
    )
    return R @ (scale[..., :, None] * body) + pos[..., :, None]


# ---------------------------------------------------------------------------
# main entry
# ---------------------------------------------------------------------------


def _sample_offsets(lo, hi, step, dtype):
    """Static-count linespace offsets: lo + k*step while <= hi (+eps), mirroring
    the reference's accumulating `linespace` (matrix_utils.cpp:368-380)."""
    out = []
    k = 0
    while True:
        v = lo + k * step
        if v > hi + 1e-9:
            break
        out.append(v)
        k += 1
        if k > 1000:
            break
    return jnp.asarray(out, dtype=dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "return_internals"))
def detect_cuboid_single(
    gray: jnp.ndarray,
    K: jnp.ndarray,
    T_wc: jnp.ndarray,
    bbox: jnp.ndarray,
    lines: jnp.ndarray,
    line_mask: jnp.ndarray,
    cfg: ProposalConfig = ProposalConfig(),
    return_internals: bool = False,
):
    """Detect the best cuboid for one 2D bounding box.

    Args:
      gray: (H, W) float grayscale image.
      K: (3, 3) intrinsics.
      T_wc: (4, 4) camera-to-world transform.
      bbox: (4,) [x, y, w, h] (0-based pixels).
      lines: (L, 4) detected segments [x1 y1 x2 y2] (padded).
      line_mask: (L,) validity of `lines`.
      cfg: static configuration.

    Mirrors detect_cuboid (box_proposal_detail.cpp:65-861) with
    whether_sample_bbox_height=False (the setting used by both reference
    drivers: detect_3d_cuboid/src/main.cpp:68, object_slam/src/main_obj.cpp:498).
    """
    dtype = gray.dtype
    img_h, img_w = gray.shape
    bbox = bbox.astype(dtype)
    left = jnp.floor(bbox[0])
    top = jnp.floor(bbox[1])
    w = jnp.floor(bbox[2])
    h = jnp.floor(bbox[3])
    right = left + w
    down = top + h
    down_expan = down  # no bbox-height sampling
    diag = jnp.sqrt(w * w + h * h)

    # expanded ROI (box_proposal_detail.cpp:242-248), ints in the reference
    wid = jnp.minimum(
        jnp.maximum(jnp.minimum(20.0, w - 100.0), 10.0),
        jnp.maximum(jnp.minimum(20.0, h - 100.0), 10.0),
    )
    exp_left = jnp.maximum(0.0, left - wid)
    exp_right = jnp.minimum(img_w - 1.0, right + wid)
    exp_top = jnp.maximum(0.0, top - wid)
    exp_down = jnp.minimum(img_h - 1.0, down_expan + wid)

    geom = _BoxGeom(left, top, right, down_expan, exp_left, exp_top, exp_right, exp_down, diag)

    # ---- lines: inside expanded ROI, merged, length-filtered --------------
    lines = line_ops.align_left_right(lines.astype(dtype))
    inside = line_ops.inside_box_mask(
        lines, (exp_left, exp_top), (exp_right, exp_down)
    )
    m_lines, m_mask = line_ops.merge_break_lines(
        lines,
        line_mask & inside,
        cfg.pre_merge_dist_thre,
        cfg.pre_merge_angle_thre_deg,
        cfg.edge_length_threshold,
    )
    angles = line_ops.line_angles(m_lines)
    mids = line_ops.line_midpoints(m_lines)

    # ---- distance map -----------------------------------------------------
    dist_map = image_ops.roi_canny_distance_map(
        gray,
        exp_left.astype(jnp.int32),
        exp_top.astype(jnp.int32),
        exp_right.astype(jnp.int32),
        exp_down.astype(jnp.int32),
        low=cfg.canny_low,
        high=cfg.canny_high,
    ).astype(dtype)

    # ---- sample grids ------------------------------------------------------
    cam0 = cam.make_camera_pose(K.astype(dtype), T_wc.astype(dtype))
    euler_raw = cam0.euler

    if cfg.sample_cam_roll_pitch:
        rp_off = _sample_offsets(-6.0, 6.0, 3.0, dtype) * (math.pi / 180.0)
        rolls = euler_raw[0] + rp_off
        pitchs = euler_raw[1] + rp_off
        roll_grid, pitch_grid = jnp.meshgrid(rolls, pitchs, indexing="ij")
        roll_flat = roll_grid.reshape(-1)
        pitch_flat = pitch_grid.reshape(-1)
    else:
        roll_flat = euler_raw[0][None]
        pitch_flat = euler_raw[1][None]
    RP = roll_flat.shape[0]

    # rebuild camera products per (roll, pitch): rotation replaced, translation kept
    R_new = rotu.euler_zyx_to_rot(roll_flat, pitch_flat, jnp.broadcast_to(euler_raw[2], roll_flat.shape))
    T_new = jnp.broadcast_to(T_wc.astype(dtype), (RP, 4, 4))
    T_new = T_new.at[:, :3, :3].set(R_new)
    cams = cam.make_camera_pose(jnp.broadcast_to(K.astype(dtype), (RP, 3, 3)), T_new)
    ground_sensor = cam.ground_plane_sensor_frame(T_new)  # (RP, 4)

    yaw_off = _sample_offsets(-45.0, 45.0, 6.0, dtype) * (math.pi / 180.0)
    yaw_init = euler_raw[2] - math.pi / 2.0
    yaws = yaw_init + yaw_off  # (Y,)
    Y = yaws.shape[0]

    # top-edge samples (box_proposal_detail.cpp:212-237):
    # step = min(20, w // 10) integer semantics; samples while <= right-5
    step = jnp.minimum(20.0, jnp.floor(w / 10.0))
    ks = jnp.arange(cfg.max_top_samples, dtype=dtype)
    top_xs = left + 5.0 + ks * step
    top_ok = (top_xs <= right - 5.0) & (step >= 1.0)
    T = cfg.max_top_samples

    # ---- vanishing points + VP-supported edges -----------------------------
    vps = vanishing_points(cams.KinvR[:, None, :, :], yaws[None, :])  # (RP, Y, 3, 2)
    ang_a, ang_b, has = vp_support_edge_angles(
        vps, mids, angles, m_mask, cfg.vp12_edge_angle_thre_deg, cfg.vp3_edge_angle_thre_deg
    )  # (RP, Y, 3)

    # ---- corner chains over the full grid ---------------------------------
    c1 = jnp.stack([top_xs, jnp.broadcast_to(top, top_xs.shape)], axis=-1)  # (T, 2)
    vps_b = vps[:, :, None, :, :]  # (RP, Y, 1, 3, 2)
    c1_b = c1[None, None, :, :]  # (1, 1, T, 2)

    config_ids = []
    if cfg.consider_config_1:
        config_ids.append(1)
    if cfg.consider_config_2:
        config_ids.append(2)

    all_corners, all_vp1pos, all_valid, all_dist, all_angle, all_cfgid = [], [], [], [], [], []
    for config_id in config_ids:
        corners, vp1_pos, valid = _corner_chain(
            vps_b, c1_b, geom, config_id, cfg.shorted_edge_thre
        )  # (RP, Y, T, 8, 2)
        valid &= top_ok[None, None, :]
        dist = _edge_dist_score(dist_map, corners, config_id, cfg.reweight_edge_distance)
        dist = dist / diag
        angle = _edge_angle_score(
            ang_a[:, :, None, :], ang_b[:, :, None, :], has[:, :, None, :], corners, config_id
        )
        all_corners.append(corners)
        all_vp1pos.append(vp1_pos)
        all_valid.append(valid)
        all_dist.append(dist)
        all_angle.append(angle)
        all_cfgid.append(jnp.full(valid.shape, config_id, dtype=jnp.int32))

    corners = jnp.stack(all_corners, axis=3)  # (RP, Y, T, C, 8, 2)
    vp1_pos = jnp.stack(all_vp1pos, axis=3)
    valid = jnp.stack(all_valid, axis=3)
    dist_err = jnp.stack(all_dist, axis=3)
    angle_err = jnp.stack(all_angle, axis=3)
    cfg_id = jnp.stack(all_cfgid, axis=3)
    C = len(config_ids)

    flat = lambda x: x.reshape((RP * Y * T * C,) + x.shape[6:]) if x.ndim > 4 else x.reshape(-1)
    corners_f = corners.reshape(RP * Y * T * C, 8, 2)
    valid_f = valid.reshape(-1)
    dist_f = dist_err.reshape(-1)
    angle_f = angle_err.reshape(-1)
    vp1_f = vp1_pos.reshape(-1)
    cfgid_f = cfg_id.reshape(-1)
    del flat

    # ---- fusion ------------------------------------------------------------
    scores, kept = fuse_normalized_scores(
        dist_f, angle_f, valid_f, cfg.weight_vp_angle, cfg.whether_normalize_two_errors
    )

    # ---- lift every hypothesis to 3D --------------------------------------
    rp_index = jnp.broadcast_to(
        jnp.arange(RP)[:, None, None, None], (RP, Y, T, C)
    ).reshape(-1)
    T_wc_f = T_new[rp_index]
    Kinv_f = cams.K_inv[rp_index]
    plane_f = ground_sensor[rp_index]
    yaw_grid = jnp.broadcast_to(yaws[None, :, None, None], (RP, Y, T, C)).reshape(-1)
    pos_f, scale_f = lift_to_3d(corners_f, T_wc_f, Kinv_f, plane_f)
    scale_ok = jnp.all(scale_f >= 0, axis=-1) & jnp.all(jnp.isfinite(scale_f), axis=-1)

    # ---- final skew-penalised ranking (box_proposal_detail.cpp:801-838) ----
    skew = jnp.maximum(scale_f[..., 0], scale_f[..., 1]) / jnp.minimum(
        scale_f[..., 0], scale_f[..., 1]
    )
    skew_err = cfg.weight_skew_error * jnp.maximum(skew - cfg.nominal_skew_ratio, 0.0)
    skew_err = jnp.where(skew > cfg.max_cut_skew, 100.0, skew_err)
    final = scores + cfg.weight_skew_error * skew_err
    final = jnp.where(kept & scale_ok & jnp.isfinite(scores), final, jnp.inf)

    best = jnp.argmin(final)
    best_valid = jnp.isfinite(final[best])

    b_corners = corners_f[best]  # (8, 2) in generation order
    b_vp1 = vp1_f[best]
    reorder = jnp.where(
        b_vp1 == 1,
        jnp.asarray(_REORDER_VP_LEFT),
        jnp.asarray(_REORDER_VP_RIGHT),
    )
    corners_2d = jnp.swapaxes(b_corners[reorder], -1, -2)  # (2, 8)
    b_pos = pos_f[best]
    b_yaw = yaw_grid[best]
    b_scale = scale_f[best]
    corners_3d = _similarity_corners_3d(b_pos, b_yaw, b_scale)

    roll_delta = roll_flat[rp_index[best]] - euler_raw[0]
    pitch_delta = pitch_flat[rp_index[best]] - euler_raw[1]

    result = ProposalResult(
        valid=best_valid,
        pos=b_pos,
        rotY=b_yaw,
        scale=b_scale,
        box_config_type=jnp.stack([cfgid_f[best], b_vp1]).astype(jnp.int32),
        corners_2d=corners_2d,
        corners_3d_world=corners_3d,
        edge_distance_error=dist_f[best],
        edge_angle_error=angle_f[best],
        normalized_error=scores[best],
        skew_ratio=skew[best],
        camera_roll_delta=roll_delta,
        camera_pitch_delta=pitch_delta,
    )
    if not return_internals:
        return result
    internals = dict(
        corners=corners_f,
        valid=valid_f,
        dist=dist_f,
        angle=angle_f,
        scores=scores,
        kept=kept,
        final=final,
        vp1_pos=vp1_f,
        cfg_id=cfgid_f,
        yaw_grid=yaw_grid,
        pos=pos_f,
        scale=scale_f,
        merged_lines=m_lines,
        merged_mask=m_mask,
        dist_map=dist_map,
        yaws=yaws,
        top_xs=top_xs,
        top_ok=top_ok,
        best=best,
    )
    return result, internals
