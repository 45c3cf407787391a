"""Sequential numpy oracle for the cuboid proposal engine.

A deliberately-naive, loop-based re-statement of the reference proposal
semantics (box_proposal_detail.cpp:65-861 + object_3d_util.cpp helpers),
used ONLY as a test oracle for the vectorized JAX engine in
cube_slam_wu_tpu.ops.proposal.  Shares the caller-provided distance map and
merged line set so the comparison isolates the hypothesis-grid logic.
"""

from __future__ import annotations

import math

import numpy as np


def normalize_to_pi(a):
    if a > math.pi / 2:
        return a - math.pi
    if a < -math.pi / 2:
        return a + math.pi
    return a


def angle_dist(a, b):
    d = abs(a - b)
    return min(d, math.pi - d)


def seg_hit_boundary(p_start, p_end, seg):
    bgn, end = seg[:2], seg[2:]
    d = p_end - p_start
    hit = np.array([-1.0, -1.0])
    if bgn[1] == end[1]:  # horizontal
        lam = (bgn[1] - p_start[1]) / d[1]
        if lam >= 0:
            tmp = p_start + lam * d
            if bgn[0] <= tmp[0] <= end[0]:
                hit = tmp.copy()
                hit[1] = bgn[1]
    if bgn[0] == end[0]:  # vertical
        lam = (bgn[0] - p_start[0]) / d[0]
        if lam >= 0:
            tmp = p_start + lam * d
            if bgn[1] <= tmp[1] <= end[1]:
                hit = tmp.copy()
                hit[0] = bgn[0]
    return hit


def line_intersect(p1s, p1e, p2s, p2e):
    x21, y21 = p1e - p1s
    x43, y43 = p2e - p2s
    x13, y13 = p1s - p2s
    denom = y43 * x21 - x43 * y21
    u_a = (x43 * y13 - y43 * x13) / denom
    return p1s + u_a * (p1e - p1s)


def inside(pt, tl, br):
    return tl[0] <= pt[0] <= br[0] and tl[1] <= pt[1] <= br[1]


def vp_support_edge_infos(vps, mids, angles, thr12, thr3):
    out = np.full((3, 2), np.nan)
    if len(mids) == 0:
        return out
    for vp_id in range(3):
        thr = math.radians(thr12 if vp_id != 2 else thr3)
        inlier_ids, raws = [], []
        for e, (mid, ang) in enumerate(zip(mids, angles)):
            raw = math.atan2(mid[1] - vps[vp_id, 1], mid[0] - vps[vp_id, 0])
            norm = normalize_to_pi(raw)
            if angle_dist(angles[e], norm) < thr:
                inlier_ids.append(e)
                raws.append(raw)
        if not inlier_ids:
            continue
        base = raws[0]
        shifted = [
            r + 2 * math.pi if r - base < -math.pi else (r - 2 * math.pi if r - base > math.pi else r)
            for r in raws
        ]
        lo = int(np.argmax(shifted))
        hi = int(np.argmin(shifted))
        out[vp_id, 0] = angles[inlier_ids[lo]]
        out[vp_id, 1] = angles[inlier_ids[hi]]
    return out


def box_edge_sum_dists(dist_map, corners, edge_ids, reweight=False):
    total = 0.0
    for k, (a, b) in enumerate(edge_ids):
        ca, cb = corners[:, a], corners[:, b]
        for s in range(11):
            pt = s / 10.0 * ca + (1 - s / 10.0) * cb
            d = dist_map[int(pt[1]), int(pt[0])]
            if reweight:
                if 4 <= k <= 5:
                    d *= 1.5
                if k == 6:
                    d *= 2.0
            total += d
    return total


def box_edge_angle_error(support, vp_edge_ids, corners):
    total = 0.0
    for vp_id in range(3):
        valid = [v for v in support[vp_id] if not math.isnan(v)]
        if valid:
            for ee in range(2):
                a = corners[:, vp_edge_ids[vp_id][2 * ee]]
                b = corners[:, vp_edge_ids[vp_id][2 * ee + 1]]
                ang = normalize_to_pi(math.atan2(b[1] - a[1], b[0] - a[0]))
                total += min(angle_dist(ang, v) for v in valid)
        else:
            total += math.radians(30) * 2
    return total


def fuse_scores(dist_err, angle_err, weight=0.8, normalize=True):
    n = len(dist_err)
    dist_err, angle_err = np.asarray(dist_err), np.asarray(angle_err)
    if n > 4:
        breaking = round(n / 3.0 * 2.0)
        d_order = np.argsort(dist_err, kind="stable")
        a_order = np.argsort(angle_err, kind="stable")
        d_keep = sorted(d_order[: breaking - 1])
        if angle_err[a_order[breaking - 1]] > angle_err[a_order[breaking - 2]]:
            a_keep = sorted(a_order[: breaking - 1])
            keep = sorted(set(d_keep) & set(a_keep))
        else:
            keep = d_keep
    else:
        keep = list(range(n))
    d = dist_err[keep]
    a = angle_err[keep]
    if normalize and len(keep) > 1:
        dn = (d - d.min()) / (d.max() - d.min())
        if a.max() - a.min() > 0:
            an = (a - a.min()) / (a.max() - a.min())
            comb = (dn + weight * an) / (1 + weight)
        else:
            comb = (dn + weight * a) / (1 + weight)
    else:
        comb = (d + weight * a) / (1 + weight)
    return comb, keep


def ray_plane(rays, plane):
    frac = -plane[3] / (plane[:3] @ rays)
    return frac[None, :] * rays


def plane_hits_3d(T_wc, invK, plane_sensor, pixels):
    pix = np.vstack([pixels, np.ones((1, pixels.shape[1]))])
    rays = invK @ pix
    pts = ray_plane(rays, plane_sensor)
    homo = np.vstack([pts, np.ones((1, pts.shape[1]))])
    world = T_wc @ homo
    return world[:3] / world[3]


def lift(corners, vp1_pos, yaw, plane_sensor, T_wc, invK):
    gnd = plane_hits_3d(T_wc, invK, plane_sensor, corners[:, 4:8])
    length_half = np.linalg.norm(gnd[:, 0] - gnd[:, 3]) / 2
    width_half = np.linalg.norm(gnd[:, 0] - gnd[:, 1]) / 2
    normal = np.cross(gnd[:, 0] - gnd[:, 1], [0, 0, 1.0])
    normal /= np.linalg.norm(normal)
    dist = -normal @ gnd[:, 0]
    plane_w = np.concatenate([normal, [dist]])
    if dist < 0:
        plane_w = -plane_w
    wall_s = T_wc.T @ plane_w
    top = plane_hits_3d(T_wc, invK, wall_s, corners[:, 1:2])
    height_half = top[2, 0] / 2
    pos = np.array([gnd[0].mean(), gnd[1].mean(), height_half])
    scale = np.array([length_half, width_half, height_half])
    return pos, scale


EDGES_CFG1 = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 5), (2, 4), (3, 7), (4, 7), (4, 5)]
EDGES_CFG2 = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 5), (2, 4), (4, 5)]
VP_EDGES_CFG1 = [(0, 1, 7, 4), (3, 0, 4, 5), (3, 7, 1, 5)]
VP_EDGES_CFG2 = [(0, 1, 2, 3), (3, 0, 4, 5), (2, 4, 1, 5)]


def detect_cuboid_oracle(
    dist_map,
    merged_lines,
    K,
    T_wc,
    bbox,
    yaw_samples,
    shorted_edge_thre=20.0,
    weight_vp_angle=0.8,
    nominal_skew_ratio=1.0,
    max_cut_skew=3.0,
    weight_skew_error=1.5,
):
    """Run the sequential proposal loop for one box with a fixed camera pose
    (no roll/pitch or height sampling).  Returns (records, best) where
    records is a list of dicts per valid hypothesis and best is the winning
    record (or None)."""
    K = np.asarray(K, float)
    T_wc = np.asarray(T_wc, float)
    invK = np.linalg.inv(K)
    R_wc = T_wc[:3, :3]
    KinvR = K @ R_wc.T
    left, top, w, h = [float(v) for v in bbox]
    right, down = left + w, top + h
    down_expan = down
    diag = math.hypot(w, h)
    wid = min(max(min(20, w - 100), 10), max(min(20, h - 100), 10))
    exp_left, exp_top = max(0.0, left - wid), max(0.0, top - wid)
    exp_right = min(dist_map.shape[1] - 1.0, right + wid)
    exp_down = min(dist_map.shape[0] - 1.0, down_expan + wid)

    angles = [math.atan2(l[3] - l[1], l[2] - l[0]) for l in merged_lines]
    mids = [((l[0] + l[2]) / 2, (l[1] + l[3]) / 2) for l in merged_lines]

    step = min(20, int(w) // 10)
    tops = []
    x = left + 5
    while x <= right - 5 and step >= 1:
        tops.append(x)
        x += step

    plane_sensor = T_wc.T @ np.array([0, 0, 1.0, 0])

    records = []
    for yaw in yaw_samples:
        dirs = [
            np.array([math.cos(yaw), math.sin(yaw), 0.0]),
            np.array([-math.sin(yaw), math.cos(yaw), 0.0]),
            np.array([0.0, 0.0, 1.0]),
        ]
        vps = np.stack([(KinvR @ d)[:2] / (KinvR @ d)[2] for d in dirs])
        support = vp_support_edge_infos(vps, mids, angles, 15.0, 10.0)
        for top_id, tx in enumerate(tops):
            c1 = np.array([tx, top])
            c2 = seg_hit_boundary(vps[0], c1, np.array([right, top, right, down_expan]))
            vp1_pos = 0
            if c2[0] == -1:
                c2 = seg_hit_boundary(vps[0], c1, np.array([left, top, left, down_expan]))
                if c2[0] != -1:
                    vp1_pos = 2
            else:
                vp1_pos = 1
            if vp1_pos == 0 or np.linalg.norm(c1 - c2) < shorted_edge_thre:
                continue
            for config_id in (1, 2):
                if config_id == 1:
                    bx = left if vp1_pos == 1 else right
                    c4 = seg_hit_boundary(vps[1], c1, np.array([bx, top, bx, down_expan]))
                    if c4[1] == -1 or np.linalg.norm(c1 - c4) < shorted_edge_thre:
                        continue
                    c3 = line_intersect(vps[1], c2, vps[0], c4)
                    if not inside(c3, (left, top), (right, down_expan)):
                        continue
                    if (
                        np.linalg.norm(c3 - c4) < shorted_edge_thre
                        or np.linalg.norm(c3 - c2) < shorted_edge_thre
                    ):
                        continue
                else:
                    bx = left if vp1_pos == 1 else right
                    c3 = seg_hit_boundary(vps[1], c2, np.array([bx, top, bx, down_expan]))
                    if c3[1] == -1 or np.linalg.norm(c2 - c3) < shorted_edge_thre:
                        continue
                    c4 = line_intersect(vps[0], c3, vps[1], c1)
                    if not inside(c4, (left, exp_top), (right, exp_down)):
                        continue
                    if (
                        np.linalg.norm(c3 - c4) < shorted_edge_thre
                        or np.linalg.norm(c4 - c1) < shorted_edge_thre
                    ):
                        continue
                c5 = seg_hit_boundary(vps[2], c3, np.array([left, down_expan, right, down_expan]))
                if c5[1] == -1 or np.linalg.norm(c3 - c5) < shorted_edge_thre:
                    continue
                c6 = line_intersect(vps[1], c5, vps[2], c2)
                if not inside(c6, (exp_left, exp_top), (exp_right, exp_down)):
                    continue
                if (
                    np.linalg.norm(c6 - c2) < shorted_edge_thre
                    or np.linalg.norm(c6 - c5) < shorted_edge_thre
                ):
                    continue
                c7 = line_intersect(vps[0], c6, vps[2], c1)
                if not inside(c7, (exp_left, exp_top), (exp_right, exp_down)):
                    continue
                if (
                    np.linalg.norm(c7 - c1) < shorted_edge_thre
                    or np.linalg.norm(c7 - c6) < shorted_edge_thre
                ):
                    continue
                c8 = line_intersect(vps[0], c5, vps[1], c7)
                if not inside(c8, (exp_left, exp_top), (exp_right, exp_down)):
                    continue
                if (
                    np.linalg.norm(c8 - c4) < shorted_edge_thre
                    or np.linalg.norm(c8 - c5) < shorted_edge_thre
                    or np.linalg.norm(c8 - c7) < shorted_edge_thre
                ):
                    continue
                corners = np.stack([c1, c2, c3, c4, c5, c6, c7, c8], axis=1)
                if config_id == 1:
                    sum_d = box_edge_sum_dists(dist_map, corners, EDGES_CFG1)
                    ang = box_edge_angle_error(support, VP_EDGES_CFG1, corners)
                else:
                    sum_d = box_edge_sum_dists(dist_map, corners, EDGES_CFG2, reweight=True)
                    ang = box_edge_angle_error(support, VP_EDGES_CFG2, corners)
                records.append(
                    dict(
                        config=config_id,
                        vp1_pos=vp1_pos,
                        yaw=yaw,
                        top_id=top_id,
                        dist=sum_d / diag,
                        angle=ang,
                        corners=corners,
                    )
                )

    if not records:
        return records, None
    comb, keep = fuse_scores(
        [r["dist"] for r in records], [r["angle"] for r in records], weight_vp_angle
    )
    best, best_score = None, np.inf
    for score, idx in zip(comb, keep):
        r = records[idx]
        pos, scale = lift(r["corners"], r["vp1_pos"], r["yaw"], plane_sensor, T_wc, invK)
        if (scale < 0).any():
            continue
        skew = max(scale[0], scale[1]) / min(scale[0], scale[1])
        skew_err = weight_skew_error * max(skew - nominal_skew_ratio, 0.0)
        if skew > max_cut_skew:
            skew_err = 100.0
        total = score + weight_skew_error * skew_err
        if total < best_score:
            best_score = total
            best = dict(r, pos=pos, scale=scale, normalized=score, skew=skew, total=total)
    return records, best
