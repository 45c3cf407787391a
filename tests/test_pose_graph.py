"""Sim3 7-DoF pose-graph optimization (slam/pose_graph.py).

Covers the reference's bundled-but-unused g2o seven-DoF surface
(types_seven_dof_expmap.h: VertexSim3Expmap + EdgeSim3): exact recovery
from consistent measurements, and the canonical monocular loop-closure
scale-drift correction demo.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cube_slam_wu_tpu.core.rotations import euler_zyx_to_rot, rot_to_quat
from cube_slam_wu_tpu.core.se3 import SE3
from cube_slam_wu_tpu.core.sim3 import Sim3
from cube_slam_wu_tpu.slam import pose_graph as pg


def _circle_truth(n, radius=10.0, dtype=jnp.float64):
    """Ground-truth world->frame SE3 poses around a closed circle."""
    ang = 2.0 * np.pi * np.arange(n) / n
    centers = np.stack(
        [radius * np.cos(ang), radius * np.sin(ang), np.zeros(n)], axis=-1
    )
    quats, trans = [], []
    for a, c in zip(ang, centers):
        R = np.asarray(
            euler_zyx_to_rot(
                jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(a + np.pi / 2)
            )
        )
        quats.append(np.asarray(rot_to_quat(jnp.asarray(R))))
        trans.append(-R @ c)  # T_iw: p_frame = R p_world + t, center c
    return SE3(jnp.asarray(np.stack(quats), dtype), jnp.asarray(np.stack(trans), dtype))


def _centers(poses: Sim3) -> np.ndarray:
    """Camera centers of S_iw vertices: p_world with S(p) = 0."""
    inv = poses.inverse()
    return np.asarray(inv.trans)


def test_edge_residual_zero_on_consistent_graph():
    n = 8
    truth = _circle_truth(n)
    scales = jnp.asarray(np.linspace(1.0, 0.5, n))
    poses = pg.sim3_from_se3(truth, scales)
    idx = jnp.arange(n - 1)
    Si = pg._take(poses, idx)
    Sj = pg._take(poses, idx + 1)
    meas = Sj.compose(Si.inverse())
    g = pg.Sim3PoseGraph(
        poses=poses,
        edge_i=idx.astype(jnp.int32),
        edge_j=(idx + 1).astype(jnp.int32),
        meas=meas,
        weight=jnp.ones((n - 1,)),
        edge_mask=jnp.ones((n - 1,), bool),
        pose_mask=jnp.ones((n,), bool),
    )
    r = pg.edge_residuals(g, poses)
    assert float(jnp.max(jnp.abs(r))) < 1e-9


def test_exact_recovery_from_perturbed_init():
    """Consistent measurements + fixed first vertex: LM must recover the
    true vertices (including scale) from a perturbed initialisation."""
    n = 10
    truth_se3 = _circle_truth(n)
    true_scales = jnp.asarray(np.geomspace(1.0, 0.6, n))
    truth = pg.sim3_from_se3(truth_se3, true_scales)

    idx = jnp.arange(n - 1)
    meas = pg._take(truth, idx + 1).compose(pg._take(truth, idx).inverse())
    # loop edge closing last -> first
    loop = pg._take(truth, jnp.asarray([0])).compose(
        pg._take(truth, jnp.asarray([n - 1])).inverse()
    )
    edge_i = jnp.concatenate([idx, jnp.asarray([n - 1])]).astype(jnp.int32)
    edge_j = jnp.concatenate([idx + 1, jnp.asarray([0])]).astype(jnp.int32)
    meas = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), meas, loop)

    rng = np.random.default_rng(3)
    d = jnp.asarray(rng.normal(scale=0.05, size=(n, 7)))
    d = d.at[0].set(0.0)  # first vertex is the gauge anchor
    init = Sim3.exp(d).compose(truth)

    g = pg.Sim3PoseGraph(
        poses=init,
        edge_i=edge_i,
        edge_j=edge_j,
        meas=meas,
        weight=jnp.ones((n,)),
        edge_mask=jnp.ones((n,), bool),
        pose_mask=jnp.ones((n,), bool),
    )
    res = pg.optimize(g, iterations=20)
    assert float(res.chi2) < 1e-14
    np.testing.assert_allclose(res.poses.scale, truth.scale, atol=1e-6)
    np.testing.assert_allclose(res.poses.trans, truth.trans, atol=1e-5)
    q_dot = np.abs(np.sum(np.asarray(res.poses.quat) * np.asarray(truth.quat), axis=-1))
    np.testing.assert_allclose(q_dot, 1.0, atol=1e-8)


def test_scale_drift_corrected_at_loop_closure():
    """The canonical monocular demo (Strasdat-style): a loop trajectory
    whose odometry translation drifts by 2%/step in scale; the loop-closure
    Sim3 alignment measures the true relative pose INCLUDING the
    accumulated scale ratio.  7-DoF optimization absorbs the drift into
    the vertex scales — recovering near-true camera centers — which the
    reference's 6-DoF machinery cannot express."""
    n = 40
    k = 1.02  # per-step multiplicative scale drift
    truth_se3 = _circle_truth(n)

    # drift-aware target vertices: S_i = diag(k^i) * T_iw_true, i.e. the
    # true poses expressed at each frame's drifted local map scale
    kpow = jnp.asarray(k ** np.arange(n))
    target = Sim3(
        truth_se3.quat, kpow[:, None] * truth_se3.trans, kpow
    )

    # drifted odometry as the front-end sees it: true relative rotation,
    # translation at the local (drifted) scale, believed scale 1
    quats, trans = [], []
    for i in range(n - 1):
        Ti = jax.tree.map(lambda a: a[i], truth_se3)
        Tj = jax.tree.map(lambda a: a[i + 1], truth_se3)
        rel_ij = Tj.compose(Ti.inverse())
        quats.append(np.asarray(rel_ij.quat))
        trans.append(np.asarray(rel_ij.trans) * k ** (i + 1))
    drift_meas = pg.sim3_from_se3(
        SE3(jnp.asarray(np.stack(quats)), jnp.asarray(np.stack(trans))), 1.0
    )

    # front-end trajectory: chain the drifted odometry from the true start
    start = pg.sim3_from_se3(jax.tree.map(lambda a: a[0], truth_se3), 1.0)
    drifted = pg.chain_odometry(drift_meas, start)

    true_centers = _centers(pg.sim3_from_se3(truth_se3, 1.0))
    before_centers = _centers(drifted)
    before_err = np.linalg.norm(before_centers - true_centers, axis=-1)
    assert before_err[-1] > 2.0  # drift is visible before correction

    # loop edge last -> first: what Sim3 map alignment would measure — the
    # relative similarity between the drift-aware frames, scale ratio
    # k^-(n-1) included
    loop_meas = pg._take(target, jnp.asarray([0])).compose(
        pg._take(target, jnp.asarray([n - 1])).inverse()
    )
    loop_meas = Sim3(
        loop_meas.quat.reshape(4),
        loop_meas.trans.reshape(3),
        loop_meas.scale.reshape(()),
    )
    assert abs(float(loop_meas.scale) - k ** -(n - 1)) < 1e-9

    res = pg.correct_scale_drift(
        SE3(drifted.quat, drifted.trans),
        drifted.scale,
        loop_from=n - 1,
        loop_to=0,
        loop_meas=loop_meas,
        iterations=25,
    )

    # loop is closed: the optimized last->first relative similarity matches
    # the measurement, scale ratio included
    rel_opt = pg._take(res.poses, jnp.asarray([0])).compose(
        pg._take(res.poses, jnp.asarray([n - 1])).inverse()
    )
    assert abs(float(rel_opt.scale[0]) - k ** -(n - 1)) < 0.02
    # the vertex scales absorbed the drift (target k^39 ~ 2.16, was 1.0)
    s = np.asarray(res.poses.scale)
    assert s[-1] > 1.8
    assert np.all(np.diff(np.log(s)) > -1e-3)  # monotone accumulation
    # camera centers (de-scaled positions) recover the true loop
    after_err = np.linalg.norm(_centers(res.poses) - true_centers, axis=-1)
    assert after_err.mean() < 0.35 * before_err.mean()


def test_masked_padding_edge_with_zero_meas_is_inert():
    """A padded (edge_mask=False) edge whose measurement is ALL-ZERO — the
    natural pytree padding, whose scale-0 similarity would send Sim3.log to
    NaN — must contribute nothing: finite residuals/chi2 through the jacfwd
    linearisation, and an optimize() result identical to the same graph
    without the padded slot (ADVICE r3: NaN*0 poisoning)."""
    n = 10
    truth_se3 = _circle_truth(n)
    true_scales = jnp.asarray(np.geomspace(1.0, 0.7, n))
    truth = pg.sim3_from_se3(truth_se3, true_scales)
    idx = jnp.arange(n - 1)
    meas = pg._take(truth, idx + 1).compose(pg._take(truth, idx).inverse())

    rng = np.random.default_rng(7)
    d = jnp.asarray(rng.normal(scale=0.04, size=(n, 7)))
    d = d.at[0].set(0.0)
    init = Sim3.exp(d).compose(truth)

    def graph(meas, edge_i, edge_j, weight, edge_mask):
        return pg.Sim3PoseGraph(
            poses=init,
            edge_i=edge_i.astype(jnp.int32),
            edge_j=edge_j.astype(jnp.int32),
            meas=meas,
            weight=weight,
            edge_mask=edge_mask,
            pose_mask=jnp.ones((n,), bool),
        )

    g_ref = graph(
        meas, idx, idx + 1, jnp.ones((n - 1,)), jnp.ones((n - 1,), bool)
    )

    # pad one inactive slot with ALL-ZERO measurement (scale 0, quat 0)
    zero = Sim3(
        jnp.zeros((1, 4), meas.quat.dtype),
        jnp.zeros((1, 3), meas.trans.dtype),
        jnp.zeros((1,), meas.scale.dtype),
    )
    meas_p = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), meas, zero)
    g_pad = graph(
        meas_p,
        jnp.concatenate([idx, jnp.asarray([0])]),
        jnp.concatenate([idx + 1, jnp.asarray([1])]),
        jnp.ones((n,)),
        jnp.concatenate([jnp.ones((n - 1,), bool), jnp.asarray([False])]),
    )

    r = pg.edge_residuals(g_pad, g_pad.poses)
    assert np.all(np.isfinite(np.asarray(r)))
    np.testing.assert_array_equal(np.asarray(r[-1]), 0.0)

    res_ref = pg.optimize(g_ref, iterations=10)
    res_pad = pg.optimize(g_pad, iterations=10)
    assert np.isfinite(float(res_pad.chi2))
    np.testing.assert_allclose(
        float(res_pad.chi2), float(res_ref.chi2), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(res_pad.poses.trans),
        np.asarray(res_ref.poses.trans),
        rtol=1e-8,
        atol=1e-9,
    )
