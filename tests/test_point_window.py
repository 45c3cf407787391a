"""Point landmarks in the fixed-lag incremental loop
(tracker.make_windowed_point_step, point_ba.optimize prior/robust support)
and the sliding-window prior's outlier/conditioning guards
(window.absorb_frame absorb_gate / info_cap).

The guards fix a real failure mode: one camera-object edge absorbed at a
degenerate linearisation point (relative rotation near pi) put ~1e12 entries
into the never-decaying prior H, after which every later window solve seeded
LM with lambda_0 = 1e-5 * max diag(H) ~ 1e8 and could no longer move any
state — the camera froze at the origin while chi2 grew monotonically
(measured on a synthetic forward drive: ATE 5.51 m -> 0.17 m from the guard
alone)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cube_slam_wu_tpu.core.cuboid import Cuboid
from cube_slam_wu_tpu.core.se3 import SE3
from cube_slam_wu_tpu.slam import tracker, window
from cube_slam_wu_tpu.utils.metrics import ate_rmse


def _drive_scene(N=60, O=3, P=32, noise=0.08, seed=3):
    """Forward drive with noisy cuboid measurements + point-track
    observations projected from ground-truth world points."""
    rng = np.random.default_rng(seed)
    K = np.array([[240.0, 0, 160], [0, 240, 115], [0, 0, 1]])

    gt = np.zeros((N, 4, 4))
    for i in range(N):
        T = np.eye(4)
        T[:3, 0] = [1, 0, 0]
        T[:3, 1] = [0, 0, -1]
        T[:3, 2] = [0, 1, 0]
        T[:3, 3] = [0.02 * np.sin(i * 0.2), 0.08 * i, 1.65]
        gt[i] = T

    cubes_gt = np.array(
        [
            [-1.5, 4, 0.5, 0, 0, 0.3, 0.5, 0.4, 0.5],
            [1.6, 7, 0.4, 0, 0, 1.0, 0.6, 0.3, 0.4],
            [-1.8, 10, 0.5, 0, 0, -0.5, 0.4, 0.4, 0.5],
        ]
    )[:O]
    meas9 = np.zeros((N, O, 9))
    qual = np.zeros((N, O))
    has = np.zeros((N, O), bool)
    for i in range(N):
        T = SE3.from_rot_trans(jnp.asarray(gt[i][:3, :3]), jnp.asarray(gt[i][:3, 3]))
        for o in range(O):
            dy = cubes_gt[o, 1] - gt[i][1, 3]
            if 1.0 < dy < 6.0:
                cg = Cuboid.from_minimal(jnp.asarray(cubes_gt[o]))
                m = np.array(cg.transform_to(T).to_minimal())
                m[:3] += rng.normal(0, noise, 3)
                m[5] += rng.normal(0, 0.05)
                meas9[i, o] = m
                qual[i, o] = 0.7
                has[i, o] = True

    pts_w = np.column_stack(
        [rng.uniform(-4, 4, P), rng.uniform(1, 18, P), np.zeros(P)]
    )
    obs_uv = np.zeros((N, P, 2))
    obs_mask = np.zeros((N, P), bool)
    for i in range(N):
        Rcw = gt[i][:3, :3].T
        tc = -Rcw @ gt[i][:3, 3]
        pc = pts_w @ Rcw.T + tc
        uv = pc @ K.T
        with np.errstate(all="ignore"):
            uv = uv[:, :2] / uv[:, 2:3]
        ok = (
            (pc[:, 2] > 0.5)
            & (uv[:, 0] > 5) & (uv[:, 0] < 315)
            & (uv[:, 1] > 5) & (uv[:, 1] < 235)
        )
        obs_uv[i] = np.where(ok[:, None], uv + rng.normal(0, 0.4, (P, 2)), 0)
        obs_mask[i] = ok

    frames = tracker.FrameInput(
        meas=Cuboid.from_minimal(jnp.asarray(meas9)),
        quality=jnp.asarray(qual),
        has_meas=jnp.asarray(has),
        active=jnp.ones((N,), bool),
    )
    first = SE3.from_rot_trans(jnp.asarray(gt[0][:3, :3]), jnp.asarray(gt[0][:3, 3]))
    return K, gt, frames, first, obs_uv, obs_mask


def test_absorb_gate_drops_outlier_and_caps_information():
    """An edge whose linearisation point is ~pi away in yaw must not poison
    the prior: with the gate its info is dropped entirely; even with the
    gate disabled the cap bounds H."""
    dtype = jnp.float64
    prior = window.CubePrior.empty(1, dtype)
    Twc = SE3.identity((), dtype)
    est = Cuboid.from_minimal(jnp.asarray([0.0, 5, 0.5, 0, 0, 0.0, 0.5, 0.4, 0.5]))
    # measurement rotated ~pi/2 + 0.6 in yaw and 4 m away: large innovation
    meas = Cuboid.from_minimal(
        jnp.asarray([4.0, 5, 0.5, 0, 0, np.pi / 4 + 0.4, 0.5, 0.4, 0.5])
    )
    w = jnp.asarray([1.4], dtype)
    m = jnp.asarray([True])
    out = window.absorb_frame(
        prior, Twc, jax.tree.map(lambda a: a[None], meas), w, m, est
    )
    assert float(jnp.max(jnp.abs(out.H))) == 0.0  # gated out entirely

    out2 = window.absorb_frame(
        prior, Twc, jax.tree.map(lambda a: a[None], meas), w, m, est,
        absorb_gate=1e9, info_cap=1e4,
    )
    assert float(jnp.max(jnp.abs(out2.H))) <= 81 * 1e4  # 9x9 row sums of capped J


def test_inlier_absorption_unchanged_by_guards():
    """A consistent edge (small innovation, benign Jacobian) absorbs with and
    without the guards identically."""
    dtype = jnp.float64
    prior = window.CubePrior.empty(1, dtype)
    Twc = SE3.identity((), dtype)
    est = Cuboid.from_minimal(jnp.asarray([0.0, 5, 0.5, 0, 0, 0.2, 0.5, 0.4, 0.5]))
    meas = Cuboid.from_minimal(
        jnp.asarray([0.05, 5.1, 0.5, 0, 0, 0.25, 0.5, 0.4, 0.5])
    )
    w = jnp.asarray([1.4], dtype)
    m = jnp.asarray([True])
    args = (prior, Twc, jax.tree.map(lambda a: a[None], meas), w, m, est)
    out = window.absorb_frame(*args)
    out_raw = window.absorb_frame(*args, absorb_gate=1e9, info_cap=1e30)
    np.testing.assert_allclose(np.asarray(out.H), np.asarray(out_raw.H), rtol=1e-12)
    assert bool(out.valid[0])


@pytest.mark.slow
def test_point_factors_reduce_drift():
    """Ground-hinted point landmarks in the windowed loop reduce trajectory
    drift on a forward drive vs the cuboid-only windowed baseline."""
    K, gt, frames, first, obs_uv, obs_mask = _drive_scene()
    g0, _, _ = tracker.run_incremental(first, frames, window=10)
    ate0 = ate_rmse(np.asarray(g0.cam_Twc().to_xyzq())[:, :3], gt[:, :3, 3])

    ground = np.ones(obs_mask.shape, bool)  # all scene points are on z=0
    g1, _, _ = tracker.run_incremental(
        first, frames, window=10, K=jnp.asarray(K),
        point_obs=(obs_uv, obs_mask, ground), point_weight=0.05,
    )
    ate1 = ate_rmse(np.asarray(g1.cam_Twc().to_xyzq())[:, :3], gt[:, :3, 3])
    assert np.isfinite(ate1)
    assert ate1 < ate0 * 0.85  # measured: ~0.11 vs ~0.17
    assert ate1 < 0.25


@pytest.mark.slow
def test_point_respawn_clears_history():
    """A respawned slot must not mix the old landmark's observations with the
    new feature's: its point estimate and observation history reset."""
    K, gt, frames, first, obs_uv, obs_mask = _drive_scene(N=24, P=8)
    W = 8
    step = tracker.make_windowed_point_step(
        W, jnp.asarray(K), iterations=2, point_weight=0.05
    )
    from cube_slam_wu_tpu.slam.window import CubePrior
    from cube_slam_wu_tpu.slam.graph import CameraObjectGraph

    N, O = frames.quality.shape
    graph = CameraObjectGraph.empty(N, O, jnp.float64)._replace(K=jnp.asarray(K))
    carry = (graph, CubePrior.empty(O, jnp.float64),
             tracker.PointState.empty(N, 8, jnp.float64))
    ground = jnp.ones((8,), bool)
    for i in range(16):
        resp = jnp.zeros((8,), bool)
        if i == 12:
            resp = resp.at[0].set(True)  # slot 0 re-seeded at frame 12
        inp = (
            jnp.asarray(i), jax.tree.map(lambda a: a[i], frames), first,
            jnp.asarray(obs_uv[i]), jnp.asarray(obs_mask[i]), resp, ground,
        )
        carry, _ = step(carry, inp)
        _, _, ps = carry
        if i == 12:
            # history before the respawn frame is gone for slot 0
            assert not bool(ps.obs_mask[:12, 0].any())
            # other slots keep theirs
            assert bool(ps.obs_mask[:12, 1:].any())
