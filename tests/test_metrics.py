"""Trajectory metrics (utils/metrics): ATE and RPE properties."""

import numpy as np
import pytest

from cube_slam_wu_tpu.utils.metrics import ate_rmse, rpe_rmse


def _traj(n, seed=0):
    rng = np.random.default_rng(seed)
    pos = np.cumsum(rng.normal(0, 0.1, (n, 3)), axis=0)
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    ang = rng.uniform(0, 0.3, n)
    q = np.concatenate(
        [axis * np.sin(ang / 2)[:, None], np.cos(ang / 2)[:, None]], axis=1
    )  # xyzw
    return np.concatenate([pos, q], axis=1)


def test_rpe_zero_on_identical_trajectories():
    t = _traj(20)
    tr, rr = rpe_rmse(t, t)
    assert tr < 1e-12 and rr < 1e-5


def test_rpe_invariant_to_global_rigid_offset():
    """A constant world-frame offset changes ATE but not RPE."""
    t = _traj(30, seed=1)
    th = 0.7
    R = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    off = t.copy()
    off[:, :3] = t[:, :3] @ R.T + np.array([5.0, -2.0, 1.0])
    # rotate orientations by the same global R: q_off = R * q
    qw = np.array([0, 0, np.sin(th / 2), np.cos(th / 2)])  # xyzw for R

    def qmul(a, b):  # xyzw hamilton product a*b
        ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
        bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
        return np.stack(
            [
                aw * bx + ax * bw + ay * bz - az * by,
                aw * by - ax * bz + ay * bw + az * bx,
                aw * bz + ax * by - ay * bx + az * bw,
                aw * bw - ax * bx - ay * by - az * bz,
            ],
            axis=-1,
        )

    off[:, 3:] = qmul(np.broadcast_to(qw, (30, 4)), t[:, 3:])
    assert ate_rmse(off[:, :3], t[:, :3]) > 1.0
    tr, rr = rpe_rmse(off, t)
    assert tr < 1e-9 and rr < 1e-4


def test_rpe_detects_drift():
    """Per-frame velocity error of v metres shows up as RPE_t ~= v."""
    t = _traj(50, seed=2)
    drift = t.copy()
    drift[:, :3] += np.arange(50)[:, None] * np.array([0.01, 0.0, 0.0])
    tr, _ = rpe_rmse(drift, t, delta=1)
    assert 0.005 < tr < 0.02


def test_rpe_delta_bounds():
    t = _traj(10)
    with pytest.raises(ValueError):
        rpe_rmse(t, t, delta=0)
    with pytest.raises(ValueError):
        rpe_rmse(t, t, delta=10)
    tr, rr = rpe_rmse(t, t, delta=5)
    assert tr < 1e-12
