"""Mega-fused Pallas kernel for the cuboid-proposal hypothesis grid.

Round-1 profiling showed the proposal engine's ~21 ms/object has no dominant
stage: the cost is distributed over ~200 compiled XLA kernels, each touching
small (H,) SoA intermediates (H = roll*pitch*yaw*top-sample hypotheses, a few
KB..75 KB each) — per-kernel latency and HBM round-trips, not FLOPs.  This
module fuses the entire per-hypothesis pipeline — corner chain + validity
guards (box_proposal_detail.cpp:407-630), VP-alignment angle scoring
(object_3d_util.cpp:670-723) and 2D->3D lifting
(object_3d_util.cpp:941-1011) — into ONE Pallas kernel per configuration:
every intermediate lives in VMEM/registers, and the only HBM traffic is the
packed inputs (~2 MB) and the 25 output planes (~1 MB).

The chamfer-distance lookups stay OUTSIDE the kernel: Mosaic has no general
2D vector gather (only take_along_axis with operand-shaped indices), so the
corner planes returned here feed the existing XLA gather + reduction
(`_edge_dist_score`), which is a handful of kernels.

The kernel body operates on (R, 128) f32 blocks — the flat hypothesis axis
padded to lanes — with all geometry as elementwise VPU ops; corner/edge/
config tables are unrolled statically (8 corners, 2x3 VP alignment edges).

On CPU backends the kernel runs in Pallas interpreter mode, which makes the
fused path testable (and bit-comparable to the unfused path) without a TPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VP alignment edge tables (box_proposal_detail.cpp:651,665), 0-based:
# per VP, two edges, each (corner_a, corner_b)
_VP_EDGES_CFG1 = (((0, 1), (7, 4)), ((3, 0), (4, 5)), ((3, 7), (1, 5)))
_VP_EDGES_CFG2 = (((0, 1), (2, 3)), ((3, 0), (4, 5)), ((2, 4), (1, 5)))

_LANES = 128

# atan(t)/t as a degree-10 Chebyshev fit (power form in n = 2 t^2/smax - 1,
# low->high), valid for |t| <= tan(pi/8); max |atan| error 1.4e-16 — i.e.
# machine precision in f64, far below f32 eps.  Mosaic has no atan2
# primitive, so the kernel evaluates this reduced polynomial instead
# (generated/validated by scratch/atan_poly2.py).
_ATAN_T = math.sqrt(2.0) - 1.0  # tan(pi/8)
_ATAN_SMAX = _ATAN_T * _ATAN_T
_ATAN_COEF = (
    0.9727918173603546,
    -0.025900195459813414,
    0.0012335918790097465,
    -6.98007065517883e-05,
    4.296549734433192e-06,
    -2.7806823035484787e-07,
    1.8605791884879168e-08,
    -1.2747677776096358e-09,
    8.891245468808365e-11,
    -6.376645907223082e-12,
    4.570225413465466e-13,
)


def _atan2_poly(y, x):
    """Elementwise atan2 from Mosaic-lowerable primitives (abs/min/max/div/
    select + polynomial), matching jnp.arctan2 to machine precision.

    Octant reduction: a = min/max in [0, 1]; a > tan(pi/8) further reduces
    via atan(a) = pi/4 + atan((a-1)/(a+1)) so the polynomial argument stays
    in [-tan(pi/8), tan(pi/8)]."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    den = jnp.maximum(ax, ay)
    num = jnp.minimum(ax, ay)
    a = num / jnp.where(den == 0, 1.0, den)
    red = a > _ATAN_T
    t = jnp.where(red, (a - 1.0) / (a + 1.0), a)
    n = 2.0 * (t * t) / _ATAN_SMAX - 1.0
    p = jnp.zeros_like(n) + _ATAN_COEF[-1]
    for c in _ATAN_COEF[-2::-1]:
        p = p * n + c
    r = t * p + jnp.where(red, math.pi / 4.0, 0.0)
    r = jnp.where(ay > ax, math.pi / 2.0 - r, r)
    r = jnp.where(x < 0, math.pi - r, r)
    return jnp.where(y < 0, -r, r)


def _norm_pi_half(a):
    a = jnp.where(a > math.pi / 2, a - math.pi, a)
    return jnp.where(a < -math.pi / 2, a + math.pi, a)


def _ang_dist_pi(a, b):
    d = jnp.abs(a - b)
    return jnp.minimum(d, math.pi - d)


def _kernel(
    geom_ref,
    vp_ref,
    ang_ref,
    cam_ref,
    corners_ref,
    stats_ref,
    *,
    config_id: int,
    thr: float,
):
    """One fused pass over a (R, 128) hypothesis block.

    geom_ref: SMEM (1, 8)  [left, top, right, down_expan,
                            exp_left, exp_top, exp_right, exp_down]
    vp_ref:   VMEM (10, R, 128)  [a1 b1 w1 a2 b2 w2 a3 b3 w3 c1x]
    ang_ref:  VMEM (10, R, 128)  [ang_a x3, ang_b x3, has x3, lane_valid]
    cam_ref:  VMEM (25, R, 128)  [Kinv row-major x9, Twc rows 0..2 x12,
                                  ground plane x4]
    corners_ref: VMEM (16, R, 128) out  [cx0..7, cy0..7]
    stats_ref:   VMEM (9, R, 128) out   [valid, vp1_pos, angle_err,
                                         pos_x, pos_y, pos_z,
                                         len_h, wid_h, hei_h]
    """
    left = geom_ref[0, 0]
    top = geom_ref[0, 1]
    right = geom_ref[0, 2]
    down_expan = geom_ref[0, 3]
    exp_left = geom_ref[0, 4]
    exp_top = geom_ref[0, 5]
    exp_right = geom_ref[0, 6]
    exp_down = geom_ref[0, 7]

    a1, b1, w1 = vp_ref[0], vp_ref[1], vp_ref[2]
    a2, b2, w2 = vp_ref[3], vp_ref[4], vp_ref[5]
    a3, b3, w3 = vp_ref[6], vp_ref[7], vp_ref[8]
    c1x = vp_ref[9]
    # NOTE: jnp.full_like with a TRACED fill value lowers through a
    # device_put (sharding-preserving copy) that Mosaic cannot compile —
    # broadcast by arithmetic instead, everywhere in this kernel.
    c1y = jnp.zeros_like(c1x) + top

    def dir_to(a, b, w, px, py):
        # homogeneous-VP direction, see proposal._dir_to
        return w * px - a, w * py - b

    def hit_vertical(a, b, w, px, py, x0):
        Dx, Dy = dir_to(a, b, w, px, py)
        y = py + (x0 - px) * Dy / Dx
        ok = ((w * x0 - a) * Dx >= 0) & (top <= y) & (y <= down_expan)
        return jnp.zeros_like(y) + x0, y, ok

    def hit_horizontal(a, b, w, px, py, y0):
        Dx, Dy = dir_to(a, b, w, px, py)
        x = px + (y0 - py) * Dx / Dy
        ok = ((w * y0 - b) * Dy >= 0) & (left <= x) & (x <= right)
        return x, jnp.zeros_like(x) + y0, ok

    def intersect_dirs(px, py, Dx, Dy, qx, qy, Ex, Ey):
        denom = Dx * Ey - Dy * Ex
        t = ((qx - px) * Ey - (qy - py) * Ex) / denom
        return px + t * Dx, py + t * Dy

    def inside(x, y, tlx, tly, brx, bry):
        return (tlx <= x) & (x <= brx) & (tly <= y) & (y <= bry)

    def dist_ge(ax, ay, bx, by):
        return (ax - bx) ** 2 + (ay - by) ** 2 >= thr * thr

    # ---- corner chain (box_proposal_detail.cpp:407-630) --------------------
    rx_r, ry_r, ok_r = hit_vertical(a1, b1, w1, c1x, c1y, right)
    rx_l, ry_l, ok_l = hit_vertical(a1, b1, w1, c1x, c1y, left)
    vp1_pos = jnp.where(ok_r, 1.0, jnp.where(ok_l, 2.0, 0.0))
    c2x = jnp.where(ok_r, rx_r, rx_l)
    c2y = jnp.where(ok_r, ry_r, ry_l)
    valid = (vp1_pos > 0) & dist_ge(c1x, c1y, c2x, c2y)

    x_opp = jnp.where(vp1_pos == 1.0, left, right)
    if config_id == 1:
        c4x, c4y, ok4 = hit_vertical(a2, b2, w2, c1x, c1y, x_opp)
        valid &= ok4 & dist_ge(c1x, c1y, c4x, c4y)
        c3x, c3y = intersect_dirs(
            c2x, c2y, *dir_to(a2, b2, w2, c2x, c2y),
            c4x, c4y, *dir_to(a1, b1, w1, c4x, c4y),
        )
        valid &= inside(c3x, c3y, left, top, right, down_expan)
        valid &= dist_ge(c3x, c3y, c4x, c4y) & dist_ge(c3x, c3y, c2x, c2y)
    else:
        c3x, c3y, ok3 = hit_vertical(a2, b2, w2, c2x, c2y, x_opp)
        valid &= ok3 & dist_ge(c2x, c2y, c3x, c3y)
        c4x, c4y = intersect_dirs(
            c3x, c3y, *dir_to(a1, b1, w1, c3x, c3y),
            c1x, c1y, *dir_to(a2, b2, w2, c1x, c1y),
        )
        valid &= inside(c4x, c4y, left, exp_top, right, exp_down)
        valid &= dist_ge(c3x, c3y, c4x, c4y) & dist_ge(c4x, c4y, c1x, c1y)

    c5x, c5y, ok5 = hit_horizontal(a3, b3, w3, c3x, c3y, down_expan)
    valid &= ok5 & dist_ge(c3x, c3y, c5x, c5y)
    c6x, c6y = intersect_dirs(
        c5x, c5y, *dir_to(a2, b2, w2, c5x, c5y),
        c2x, c2y, *dir_to(a3, b3, w3, c2x, c2y),
    )
    valid &= inside(c6x, c6y, exp_left, exp_top, exp_right, exp_down)
    valid &= dist_ge(c6x, c6y, c2x, c2y) & dist_ge(c6x, c6y, c5x, c5y)
    c7x, c7y = intersect_dirs(
        c6x, c6y, *dir_to(a1, b1, w1, c6x, c6y),
        c1x, c1y, *dir_to(a3, b3, w3, c1x, c1y),
    )
    valid &= inside(c7x, c7y, exp_left, exp_top, exp_right, exp_down)
    valid &= dist_ge(c7x, c7y, c1x, c1y) & dist_ge(c7x, c7y, c6x, c6y)
    c8x, c8y = intersect_dirs(
        c5x, c5y, *dir_to(a1, b1, w1, c5x, c5y),
        c7x, c7y, *dir_to(a2, b2, w2, c7x, c7y),
    )
    valid &= inside(c8x, c8y, exp_left, exp_top, exp_right, exp_down)
    valid &= (
        dist_ge(c8x, c8y, c4x, c4y)
        & dist_ge(c8x, c8y, c5x, c5y)
        & dist_ge(c8x, c8y, c7x, c7y)
    )

    cx = [c1x, c2x, c3x, c4x, c5x, c6x, c7x, c8x]
    cy = [c1y, c2y, c3y, c4y, c5y, c6y, c7y, c8y]
    # NaN hygiene before anything consumes the coords
    cx = [jnp.where(jnp.isfinite(v), v, 0.0) for v in cx]
    cy = [jnp.where(jnp.isfinite(v), v, 0.0) for v in cy]
    for k in range(8):
        corners_ref[k] = cx[k]
        corners_ref[8 + k] = cy[k]

    # ---- VP alignment angle error (object_3d_util.cpp:670-723) -------------
    table = _VP_EDGES_CFG1 if config_id == 1 else _VP_EDGES_CFG2
    not_found = 30.0 / 180.0 * math.pi * 2.0
    angle_total = jnp.zeros_like(c1x)
    for vp_id in range(3):
        ang_a = ang_ref[vp_id]
        ang_b = ang_ref[3 + vp_id]
        has = ang_ref[6 + vp_id] > 0.5
        per_vp = jnp.zeros_like(c1x)
        for (a_id, b_id) in table[vp_id]:
            edge_ang = _norm_pi_half(
                _atan2_poly(cy[b_id] - cy[a_id], cx[b_id] - cx[a_id])
            )
            d = jnp.minimum(
                _ang_dist_pi(edge_ang, ang_a), _ang_dist_pi(edge_ang, ang_b)
            )
            per_vp = per_vp + d
        angle_total = angle_total + jnp.where(has, per_vp, not_found)

    # ---- 2D -> 3D lifting (object_3d_util.cpp:941-1011) --------------------
    Kinv = [cam_ref[i] for i in range(9)]
    Twc = [cam_ref[9 + i] for i in range(12)]
    g0, g1, g2, g3 = (cam_ref[21 + i] for i in range(4))

    def unproject(px, py, p0, p1, p2, p3):
        rx = Kinv[0] * px + Kinv[1] * py + Kinv[2]
        ry = Kinv[3] * px + Kinv[4] * py + Kinv[5]
        rz = Kinv[6] * px + Kinv[7] * py + Kinv[8]
        denom = p0 * rx + p1 * ry + p2 * rz
        frac = -p3 / denom
        sx, sy, sz = frac * rx, frac * ry, frac * rz
        wx = Twc[0] * sx + Twc[1] * sy + Twc[2] * sz + Twc[3]
        wy = Twc[4] * sx + Twc[5] * sy + Twc[6] * sz + Twc[7]
        wz = Twc[8] * sx + Twc[9] * sy + Twc[10] * sz + Twc[11]
        return wx, wy, wz

    bx = [None] * 4
    by = [None] * 4
    bz = [None] * 4
    for k in range(4):
        bx[k], by[k], bz[k] = unproject(cx[4 + k], cy[4 + k], g0, g1, g2, g3)

    len_h = 0.5 * jnp.sqrt(
        (bx[0] - bx[3]) ** 2 + (by[0] - by[3]) ** 2 + (bz[0] - bz[3]) ** 2
    )
    wid_h = 0.5 * jnp.sqrt(
        (bx[0] - bx[1]) ** 2 + (by[0] - by[1]) ** 2 + (bz[0] - bz[1]) ** 2
    )

    ex = bx[0] - bx[1]
    ey = by[0] - by[1]
    nn = jnp.sqrt(ey * ey + ex * ex)
    nx = ey / nn
    ny = -ex / nn
    dist = -(nx * bx[0] + ny * by[0])
    sgn = jnp.where(dist < 0, -1.0, 1.0)
    nx, ny, dist = sgn * nx, sgn * ny, sgn * dist
    w0 = Twc[0] * nx + Twc[4] * ny
    w1_ = Twc[1] * nx + Twc[5] * ny
    w2_ = Twc[2] * nx + Twc[6] * ny
    w3_ = Twc[3] * nx + Twc[7] * ny + dist
    _, _, tz = unproject(cx[1], cy[1], w0, w1_, w2_, w3_)
    hei_h = 0.5 * tz

    pos_x = 0.25 * (bx[0] + bx[1] + bx[2] + bx[3])
    pos_y = 0.25 * (by[0] + by[1] + by[2] + by[3])

    lane_valid = ang_ref[9] > 0.5
    stats_ref[0] = jnp.where(valid & lane_valid, 1.0, 0.0)
    stats_ref[1] = vp1_pos
    stats_ref[2] = angle_total
    stats_ref[3] = pos_x
    stats_ref[4] = pos_y
    stats_ref[5] = hei_h
    stats_ref[6] = len_h
    stats_ref[7] = wid_h
    stats_ref[8] = hei_h


def _pad_pack(arrs, R, dtype):
    """Stack flat (H,) arrays into one (n, R, 128) block, zero-padded."""
    H = arrs[0].shape[0]
    padded = []
    for a in arrs:
        a = a.astype(dtype)
        a = jnp.pad(a, (0, R * _LANES - H))
        padded.append(a.reshape(R, _LANES))
    return jnp.stack(padded)


@functools.partial(
    jax.jit, static_argnames=("config_id", "thr", "interpret")
)
def _run_block(geom, vp_pack, ang_pack, cam_pack, config_id, thr, interpret):
    R = vp_pack.shape[1]
    kern = functools.partial(_kernel, config_id=config_id, thr=thr)
    corners, stats = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((16, R, _LANES), vp_pack.dtype),
            jax.ShapeDtypeStruct((9, R, _LANES), vp_pack.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(geom, vp_pack, ang_pack, cam_pack)
    return corners, stats


def hypothesis_block_fused(
    vp: dict,
    c1x: jnp.ndarray,
    geom,
    config_id: int,
    thr: float,
    ang_a: list,
    ang_b: list,
    has: list,
    Kinv: dict,
    Twc: dict,
    plane: tuple,
    lane_valid: jnp.ndarray,
):
    """Fused replacement for (_corner_chain, _edge_angle_score, _lift_soa).

    All inputs are the flat (H,) SoA arrays detect_cuboid_single already
    builds; returns (cx (8,H), cy (8,H), vp1_pos (H,), valid (H,),
    angle (H,), pos_x, pos_y, pos_z, len_h, wid_h, hei_h).
    """
    H = c1x.shape[0]
    dtype = c1x.dtype
    R = -(-H // _LANES)

    vp_pack = _pad_pack(
        [vp["a1"], vp["b1"], vp["w1"], vp["a2"], vp["b2"], vp["w2"],
         vp["a3"], vp["b3"], vp["w3"], c1x],
        R, dtype,
    )
    ang_pack = _pad_pack(
        [ang_a[0], ang_a[1], ang_a[2], ang_b[0], ang_b[1], ang_b[2],
         has[0].astype(dtype), has[1].astype(dtype), has[2].astype(dtype),
         lane_valid.astype(dtype)],
        R, dtype,
    )
    cam_pack = _pad_pack(
        [Kinv[f"{i}{j}"] for i in range(3) for j in range(3)]
        + [Twc[f"{i}{j}"] for i in range(3) for j in range(4)]
        + list(plane),
        R, dtype,
    )
    geom_arr = jnp.stack(
        [geom.left, geom.top, geom.right, geom.down_expan,
         geom.exp_left, geom.exp_top, geom.exp_right, geom.exp_down]
    ).astype(dtype)[None, :]

    interpret = jax.default_backend() == "cpu"
    corners, stats = _run_block(
        geom_arr, vp_pack, ang_pack, cam_pack, config_id, float(thr), interpret
    )
    corners = corners.reshape(16, R * _LANES)[:, :H]
    stats = stats.reshape(9, R * _LANES)[:, :H]
    cx = corners[:8]
    cy = corners[8:]
    valid = stats[0] > 0.5
    vp1_pos = stats[1].astype(jnp.int32)
    angle = stats[2]
    pos_x, pos_y, pos_z = stats[3], stats[4], stats[5]
    len_h, wid_h, hei_h = stats[6], stats[7], stats[8]
    return cx, cy, vp1_pos, valid, angle, pos_x, pos_y, pos_z, len_h, wid_h, hei_h
