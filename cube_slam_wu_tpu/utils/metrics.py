"""Trajectory metrics: ATE RMSE (direct and SE3-aligned) and RPE."""

from __future__ import annotations

import numpy as np


def _quat_to_R(q_xyzw: np.ndarray) -> np.ndarray:
    """Rotation matrices from (N, 4) xyzw quaternions (TUM row order)."""
    q = np.asarray(q_xyzw, dtype=np.float64)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.empty(q.shape[:-1] + (3, 3))
    R[:, 0, 0] = 1 - 2 * (y * y + z * z)
    R[:, 0, 1] = 2 * (x * y - z * w)
    R[:, 0, 2] = 2 * (x * z + y * w)
    R[:, 1, 0] = 2 * (x * y + z * w)
    R[:, 1, 1] = 1 - 2 * (x * x + z * z)
    R[:, 1, 2] = 2 * (y * z - x * w)
    R[:, 2, 0] = 2 * (x * z - y * w)
    R[:, 2, 1] = 2 * (y * z + x * w)
    R[:, 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def rpe_rmse(
    est_xyzq: np.ndarray, truth_xyzq: np.ndarray, delta: int = 1
) -> tuple[float, float]:
    """Relative pose error RMSE over a frame interval `delta` (standard TUM
    evaluation, Sturm et al. 2012): per-pair error
    E_i = (Q_i^-1 Q_{i+d})^-1 (P_i^-1 P_{i+d}).

    Inputs are (N, 7) rows [x y z qx qy qz qw] (camera-to-world).  Returns
    (translational RMSE in metres, rotational RMSE in degrees).
    """
    est = np.asarray(est_xyzq, dtype=np.float64)
    truth = np.asarray(truth_xyzq, dtype=np.float64)
    assert est.shape == truth.shape and est.shape[1] == 7
    n = est.shape[0]
    if not 0 < delta < n:
        raise ValueError(f"delta must be in [1, {n - 1}], got {delta}")
    Re, te = _quat_to_R(est[:, 3:]), est[:, :3]
    Rt, tt = _quat_to_R(truth[:, 3:]), truth[:, :3]

    i, j = np.arange(n - delta), np.arange(delta, n)
    # relative motions A = P_i^-1 P_j (est), B = Q_i^-1 Q_j (truth)
    Ra = np.einsum("nba,nbc->nac", Re[i], Re[j])
    ta = np.einsum("nba,nb->na", Re[i], te[j] - te[i])
    Rb = np.einsum("nba,nbc->nac", Rt[i], Rt[j])
    tb = np.einsum("nba,nb->na", Rt[i], tt[j] - tt[i])
    # error E = B^-1 A
    Rerr = np.einsum("nba,nbc->nac", Rb, Ra)
    terr = np.einsum("nba,nb->na", Rb, ta - tb)

    t_rmse = float(np.sqrt((terr * terr).sum(axis=1).mean()))
    cos = np.clip((np.trace(Rerr, axis1=1, axis2=2) - 1.0) / 2.0, -1.0, 1.0)
    ang = np.degrees(np.arccos(cos))
    r_rmse = float(np.sqrt((ang * ang).mean()))
    return t_rmse, r_rmse


def ate_rmse(est_xyz: np.ndarray, truth_xyz: np.ndarray, align: bool = False) -> float:
    """Absolute trajectory error RMSE over translations.

    `align=False` compares directly (the reference fixes frame 0 to ground
    truth so its committed outputs are in the truth frame already);
    `align=True` applies the Horn/Umeyama closed-form SE3 alignment first
    (standard TUM evaluation).
    """
    est = np.asarray(est_xyz, dtype=np.float64)
    truth = np.asarray(truth_xyz, dtype=np.float64)
    assert est.shape == truth.shape
    if align:
        mu_e = est.mean(axis=0)
        mu_t = truth.mean(axis=0)
        E = est - mu_e
        T = truth - mu_t
        W = T.T @ E
        U, _, Vt = np.linalg.svd(W)
        S = np.eye(3)
        if np.linalg.det(U @ Vt) < 0:
            S[2, 2] = -1
        R = U @ S @ Vt
        t = mu_t - R @ mu_e
        est = est @ R.T + t
    d = est - truth
    return float(np.sqrt((d * d).sum(axis=1).mean()))
