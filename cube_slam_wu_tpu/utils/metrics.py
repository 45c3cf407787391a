"""Trajectory metrics: ATE RMSE (direct and SE3-aligned)."""

from __future__ import annotations

import numpy as np


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
