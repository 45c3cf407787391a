"""Visualization rasterizers (utils/viz): bounds safety and draw coverage."""

import numpy as np

from cube_slam_wu_tpu.utils import viz


def test_draw_line_stays_in_bounds_and_marks_pixels():
    img = np.zeros((40, 60, 3), np.uint8)
    viz.draw_line(img, (-20.0, -5.0), (100.0, 80.0), (255, 0, 0), 2)
    assert img[..., 0].sum() > 0  # something drawn
    # clipping must not wrap or crash; corners untouched by the diagonal
    assert img.shape == (40, 60, 3)


def test_draw_cuboid_all_configs_draw_both_edge_classes():
    rng = np.random.default_rng(0)
    img = np.zeros((100, 120, 3), np.uint8)
    corners = np.stack(
        [rng.uniform(10, 110, 8), rng.uniform(10, 90, 8)]
    )  # (2, 8)
    for config_id, vp1_pos in [(1, 1), (1, 2), (2, 1)]:
        out = viz.draw_cuboid(img, corners, config_id=config_id, vp1_pos=vp1_pos)
        assert out.shape == img.shape
        assert (out[..., 1] == 255).any()  # visible edges
        assert (out[..., 1] == 120).any()  # hidden edges
        assert not img.any()  # input untouched (copy semantics)


def test_draw_cuboid_offscreen_corners_no_crash():
    img = np.zeros((50, 50, 3), np.uint8)
    corners = np.stack([np.linspace(-200, 300, 8), np.linspace(-100, 400, 8)])
    out = viz.draw_cuboid(img, corners)
    assert out.shape == img.shape


def test_lines_overlay_and_top_view():
    img = np.zeros((50, 80, 3), np.uint8)
    lines = np.array([[5.0, 5.0, 70.0, 5.0], [10.0, 40.0, 10.0, 10.0]])
    out = viz.draw_lines_overlay(img, lines)
    assert (out[5, 30] == (255, 0, 0)).all()

    est = np.column_stack([np.linspace(0, 1, 20), np.sin(np.linspace(0, 3, 20)), np.zeros(20)])
    top = viz.trajectory_top_view(est, est + 0.05)
    assert top.shape == (512, 512, 3)
    # both trajectory colors present
    assert (top == np.array([200, 30, 30])).all(-1).any()
    assert (top == np.array([30, 30, 200])).all(-1).any()


def test_top_view_degenerate_single_point():
    est = np.zeros((2, 3))
    top = viz.trajectory_top_view(est)
    assert top.shape == (512, 512, 3)
    assert np.isfinite(top).all()
