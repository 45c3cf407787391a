"""Cuboid landmark tests (reference g2o_Object.h:23-199)."""

import jax.numpy as jnp
import numpy as np

from cube_slam_wu_tpu.core.cuboid import Cuboid
from cube_slam_wu_tpu.core.se3 import SE3


def _sample_cuboid(seed=0):
    rng = np.random.default_rng(seed)
    v = np.concatenate(
        [
            rng.normal(size=3),
            rng.uniform(-0.5, 0.5, size=2),
            rng.uniform(-np.pi, np.pi, size=1),
            rng.uniform(0.2, 1.0, size=3),
        ]
    )
    return Cuboid.from_minimal(jnp.asarray(v)), v


def test_minimal_roundtrip():
    c, v = _sample_cuboid(1)
    np.testing.assert_allclose(np.asarray(c.to_minimal()), v, atol=1e-9)


def test_exp_update_identity():
    c, _ = _sample_cuboid(2)
    c2 = c.exp_update(jnp.zeros(9))
    np.testing.assert_allclose(np.asarray(c2.to_minimal()), np.asarray(c.to_minimal()), atol=1e-12)


def test_log_error_zero_for_self():
    c, _ = _sample_cuboid(3)
    np.testing.assert_allclose(np.asarray(c.log_error(c)), 0.0, atol=1e-10)


def test_exp_update_log_error_consistency():
    """error(self.exp_update(u), self) == u for the se3 part (right-mult)."""
    c, _ = _sample_cuboid(4)
    u = jnp.asarray(np.random.default_rng(5).normal(size=9) * 0.1)
    c2 = c.exp_update(u)
    # pose_diff = c.pose^-1 * c2.pose = exp(u[:6])
    err = np.asarray(c2.log_error(c))
    np.testing.assert_allclose(err[:6], np.asarray(u[:6]), atol=1e-8, rtol=1e-6)
    np.testing.assert_allclose(err[6:], np.asarray(u[6:]), atol=1e-12)


def test_rotate_90_swaps_scale_and_min_error_invariance():
    c, _ = _sample_cuboid(6)
    r = c.rotate(np.pi / 2)
    np.testing.assert_allclose(
        np.asarray(r.scale), np.asarray(c.scale)[[1, 0, 2]], atol=1e-12
    )
    # min_log_error must see a 90deg-rotated copy of itself as (nearly) itself
    err = np.asarray(c.min_log_error(r))
    np.testing.assert_allclose(err, 0.0, atol=1e-9)
    err180 = np.asarray(c.min_log_error(c.rotate(np.pi)))
    np.testing.assert_allclose(err180, 0.0, atol=1e-9)


def test_transform_roundtrip():
    c, _ = _sample_cuboid(7)
    Twc = SE3.exp(jnp.asarray(np.random.default_rng(8).normal(size=6)))
    back = c.transform_to(Twc).transform_from(Twc)
    np.testing.assert_allclose(
        np.asarray(back.to_minimal()), np.asarray(c.to_minimal()), atol=1e-9
    )


def test_corners_axis_aligned():
    c = Cuboid.from_minimal(jnp.asarray([1.0, 2.0, 3.0, 0, 0, 0, 0.5, 0.6, 0.7]))
    corners = np.asarray(c.corners_3d())
    assert corners.shape == (3, 8)
    np.testing.assert_allclose(sorted(set(np.round(corners[0], 9))), [0.5, 1.5])
    np.testing.assert_allclose(sorted(set(np.round(corners[1], 9))), [1.4, 2.6])
    np.testing.assert_allclose(sorted(set(np.round(corners[2], 9))), [2.3, 3.7])
    # corner order: first four have z = center-h, last four z = center+h
    np.testing.assert_allclose(corners[2, :4], 2.3)
    np.testing.assert_allclose(corners[2, 4:], 3.7)


def test_project_bbox_center():
    """A cuboid straight ahead of an identity camera projects symmetric bbox."""
    K = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    c = Cuboid.from_minimal(jnp.asarray([0.0, 0.0, 5.0, 0, 0, 0, 0.5, 0.5, 0.5]))
    bbox = np.asarray(c.project_bbox(SE3.identity(), K))
    np.testing.assert_allclose(bbox[0], 320.0, atol=1e-6)
    np.testing.assert_allclose(bbox[1], 240.0, atol=1e-6)
    assert bbox[2] > 0 and bbox[3] > 0


def test_batched_min_log_error():
    cs, _ = _sample_cuboid(9)
    batch = Cuboid(
        SE3(jnp.broadcast_to(cs.pose.quat, (5, 4)), jnp.broadcast_to(cs.pose.trans, (5, 3))),
        jnp.broadcast_to(cs.scale, (5, 3)),
    )
    err = np.asarray(batch.min_log_error(batch))
    assert err.shape == (5, 9)
    np.testing.assert_allclose(err, 0.0, atol=1e-9)
