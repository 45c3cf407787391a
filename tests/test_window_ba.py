"""Sliding-window (fixed-lag) BA: equivalence with the full-graph path and
bounded long-sequence behaviour (slam/window.py; VERDICT round-1 item 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cube_slam_wu_tpu.core.cuboid import Cuboid
from cube_slam_wu_tpu.core.se3 import SE3
from cube_slam_wu_tpu.slam import pipeline, tracker
from cube_slam_wu_tpu.utils.metrics import ate_rmse

BASE = "/root/reference/object_slam/data"


@pytest.fixture(scope="module")
def offline_runs(reference_root):
    data = pipeline.load_offline_dataset(BASE)
    frames = pipeline.build_offline_frames(data)
    first = SE3.from_xyzq(jnp.asarray(data.truth_poses[0, 1:8]))
    full, _, _ = tracker.run_incremental(first, frames)
    w20, _, _ = tracker.run_incremental(first, frames, window=20)
    w58, _, _ = tracker.run_incremental(first, frames, window=58)
    return data, full, w20, w58


@pytest.mark.slow
def test_covering_window_identical_to_full(offline_runs):
    """window >= capacity takes the full-graph path bit-for-bit."""
    _, full, _, w58 = offline_runs
    a = np.asarray(full.cam_Twc().to_xyzq())
    b = np.asarray(w58.cam_Twc().to_xyzq())
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_window20_ate_matches_full(offline_runs):
    """Fixed-lag W=20 stays at the full-graph ATE on the bundled sequence
    (round-1 full ATE 0.2014 vs reference committed 0.2205)."""
    data, full, w20, _ = offline_runs
    truth = data.truth_poses[:, 1:4]
    ate_full = ate_rmse(np.asarray(full.cam_Twc().to_xyzq())[:, :3], truth)
    ate_w20 = ate_rmse(np.asarray(w20.cam_Twc().to_xyzq())[:, :3], truth)
    assert ate_w20 <= ate_full * 1.02 + 1e-4


def _synthetic_frames(N, O, seed=0):
    rng = np.random.default_rng(seed)
    truth_pos = np.stack(
        [
            np.linspace(0, 20, N),
            np.sin(np.linspace(0, 6, N)),
            np.zeros(N) + 1.2,
        ],
        -1,
    )
    cubes_gt = np.array(
        [
            [3, 2, 0.5, 0, 0, 0.3, 0.5, 0.4, 0.5],
            [8, -2, 0.4, 0, 0, 1.0, 0.6, 0.3, 0.4],
            [13, 2, 0.5, 0, 0, -0.5, 0.4, 0.4, 0.5],
            [18, -1, 0.6, 0, 0, 0.2, 0.5, 0.5, 0.6],
        ]
    )[:O]
    meas9 = np.zeros((N, O, 9))
    qual = np.zeros((N, O))
    has = np.zeros((N, O), bool)
    for i in range(N):
        Twc = SE3.from_rot_trans(jnp.eye(3), jnp.asarray(truth_pos[i]))
        for o in range(O):
            if abs(cubes_gt[o, 0] - truth_pos[i, 0]) < 4:
                cg = Cuboid.from_minimal(jnp.asarray(cubes_gt[o]))
                m = np.array(cg.transform_to(Twc).to_minimal())
                m[:3] += rng.normal(0, 0.02, 3)
                meas9[i, o] = m
                qual[i, o] = 0.7
                has[i, o] = True
    frames = tracker.FrameInput(
        meas=Cuboid.from_minimal(jnp.asarray(meas9)),
        quality=jnp.asarray(qual),
        has_meas=jnp.asarray(has),
        active=jnp.ones(N, bool),
    )
    first = SE3.from_rot_trans(jnp.eye(3), jnp.asarray(truth_pos[0]))
    return frames, first, truth_pos, cubes_gt


@pytest.mark.slow
def test_long_sequence_windowed_accuracy():
    """300-frame, 4-object synthetic run with W=12: per-frame cost is O(W)
    (a full-graph scan would be a 300x larger system each frame) and the
    trajectory + landmarks stay accurate through prior absorption."""
    N, O = 300, 4
    frames, first, truth_pos, cubes_gt = _synthetic_frames(N, O)
    g, chi2s, _ = tracker.run_incremental(first, frames, window=12)
    traj = np.asarray(g.cam_Twc().to_xyzq())
    err = np.linalg.norm(traj[:, :3] - truth_pos, axis=1)
    assert np.sqrt((err**2).mean()) < 0.18
    cubes = np.asarray(g.cube.to_minimal())
    assert np.asarray(g.cube_valid).all()
    np.testing.assert_allclose(cubes[:, :3], cubes_gt[:, :3], atol=0.2)
    assert np.isfinite(np.asarray(chi2s)).all()


@pytest.mark.slow
def test_prior_absorption_retains_landmark():
    """An object whose observations all leave the window keeps its estimate
    pinned by the absorbed prior (it must not drift back toward init)."""
    N, O = 60, 1
    frames, first, truth_pos, cubes_gt = _synthetic_frames(N, O)
    # object 0 is visible only near x~3 (frames < ~35 of 60)
    g, _, hist = tracker.run_incremental(first, frames, window=8)
    cube_final = np.asarray(g.cube.to_minimal())[0]
    np.testing.assert_allclose(cube_final[:3], cubes_gt[0, :3], atol=0.15)
    np.testing.assert_allclose(cube_final[6:], cubes_gt[0, 6:], atol=0.15)
