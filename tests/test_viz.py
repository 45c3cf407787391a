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


def test_depth_point_cloud_roundtrip(tmp_path, reference_root):
    """Depth->cloud on a real RGB-D pair: unprojection geometry + voxel
    downsample + PLY dump (depth_to_cloud, main_obj.cpp:73-101)."""
    from PIL import Image

    base = reference_root / "object_slam/data"
    depth = np.asarray(Image.open(base / "depth_imgs/0000_depth_raw.png"))
    rgb = np.asarray(Image.open(base / "raw_imgs/0000_rgb_raw.jpg").convert("RGB"))
    K = np.array([[535.4, 0, 320.1], [0, 539.2, 247.6], [0, 0, 1.0]])
    T = np.eye(4)
    xyz, cols = viz.depth_to_point_cloud(rgb, depth, K, T, voxel=None)
    # depth gating
    assert (xyz[:, 2] > 0.1).all() and (xyz[:, 2] < 3.0).all()
    # reproject a sample of points: must land on integer pixel centres
    uvw = xyz[:1000] @ K.T
    u = uvw[:, 0] / uvw[:, 2]
    v = uvw[:, 1] / uvw[:, 2]
    assert np.allclose(u, np.round(u), atol=1e-6)
    assert np.allclose(v, np.round(v), atol=1e-6)

    vx, vc = viz.depth_to_point_cloud(rgb, depth, K, T, voxel=0.02)
    assert len(vx) < len(xyz) // 2  # voxel grid actually reduces
    assert vc.dtype == np.uint8

    ply = tmp_path / "cloud.ply"
    viz.write_ply(ply, vx[:100], vc[:100])
    text = ply.read_text().splitlines()
    assert text[0] == "ply" and "element vertex 100" in text[2]
    assert len(text) == 10 + 100


def test_draw_line_matches():
    """drawLineMatches analogue (line_lbd/libs/draw.cpp): side-by-side
    canvas with matched segments and midpoint connectors."""
    from cube_slam_wu_tpu.utils.viz import draw_line_matches

    a = np.full((40, 60), 30.0)
    b = np.full((40, 50), 60.0)
    lines_a = np.array([[5, 5, 30, 5], [10, 20, 10, 35], [0, 0, 1, 1.0]])
    lines_b = np.array([[7, 6, 32, 6], [12, 21, 12, 36.0]])
    idx = np.array([0, 1, 0])
    matched = np.array([True, True, False])
    img = draw_line_matches(a, lines_a, b, lines_b, idx, matched)
    assert img.shape == (40, 110, 3)
    # something was drawn on both halves (pixels deviate from the flat fill)
    assert (img[:, :60] != 30).any()
    assert (img[:, 60:] != 60).any()
