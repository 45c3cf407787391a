"""Line utility tests (align/merge/filter vs reference semantics)."""

import jax.numpy as jnp
import numpy as np

from cube_slam_wu_tpu.ops import lines as line_ops


def test_align_left_right():
    lines = jnp.asarray([[10.0, 5, 2, 8], [1, 1, 9, 9]])
    out = np.asarray(line_ops.align_left_right(lines))
    np.testing.assert_allclose(out[0], [2, 8, 10, 5])
    np.testing.assert_allclose(out[1], [1, 1, 9, 9])


def test_merge_collinear_adjacent():
    # two collinear horizontal segments with a 5px gap -> merged into one
    lines = jnp.asarray(
        [
            [0.0, 10, 40, 10],
            [45.0, 10, 90, 10],
            [0.0, 50, 90, 55],  # unrelated long line
        ]
    )
    mask = jnp.asarray([True, True, True])
    out, m = line_ops.merge_break_lines(lines, mask, 20.0, 5.0, 30.0)
    out, m = np.asarray(out), np.asarray(m)
    assert m.sum() == 2
    merged = out[0]
    np.testing.assert_allclose(merged, [0, 10, 90, 10])


def test_merge_respects_angle_threshold():
    # nearly perpendicular segments that touch -> NOT merged, both dropped or
    # kept by length
    lines = jnp.asarray([[0.0, 0, 40, 0], [40.0, 0, 42, 40]])
    mask = jnp.asarray([True, True])
    out, m = line_ops.merge_break_lines(lines, mask, 20.0, 5.0, 30.0)
    m = np.asarray(m)
    assert m.sum() == 2  # both >30px, unmerged
    np.testing.assert_allclose(np.asarray(out)[0], [0, 0, 40, 0])


def test_merge_drops_short():
    lines = jnp.asarray([[0.0, 0, 10, 0], [0.0, 20, 90, 20]])
    mask = jnp.asarray([True, True])
    _, m = line_ops.merge_break_lines(lines, mask, 20.0, 5.0, 30.0)
    assert np.asarray(m).tolist() == [False, True]


def test_merge_chain():
    # three collinear pieces merge transitively
    lines = jnp.asarray([[0.0, 0, 30, 0], [35.0, 0, 60, 0], [65.0, 0, 100, 0]])
    mask = jnp.ones(3, bool)
    out, m = line_ops.merge_break_lines(lines, mask, 20.0, 5.0, 30.0)
    out, m = np.asarray(out), np.asarray(m)
    assert m.sum() == 1
    np.testing.assert_allclose(out[m][0], [0, 0, 100, 0])


def test_inside_box_mask():
    lines = jnp.asarray([[5.0, 5, 10, 10], [5.0, 5, 50, 10]])
    m = line_ops.inside_box_mask(lines, (0.0, 0.0), (20.0, 20.0))
    assert np.asarray(m).tolist() == [True, False]


def test_bbox_overlap_ratio():
    a = jnp.asarray([0.0, 0, 10, 10])
    b = jnp.asarray([5.0, 5, 10, 10])
    iou = float(line_ops.bbox_overlap_ratio(a, b))
    np.testing.assert_allclose(iou, 25.0 / 175.0, atol=1e-9)
    assert float(line_ops.bbox_overlap_ratio(a, a)) == 1.0
    assert float(line_ops.bbox_overlap_ratio(a, jnp.asarray([20.0, 20, 5, 5]))) == 0.0


def test_point_boundary_dist():
    rect = jnp.asarray([0.0, 0, 10, 20])
    np.testing.assert_allclose(
        float(line_ops.point_boundary_dist(rect, jnp.asarray([2.0, 10.0]))), 2.0
    )
    np.testing.assert_allclose(
        float(line_ops.point_boundary_dist(rect, jnp.asarray([9.0, 19.0]))), 1.0
    )
