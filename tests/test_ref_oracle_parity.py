"""Golden-fixture parity vs the reference engine compiled from source.

Round 1 flagged that our engine picks a different winner than the expected
output recorded in the reference header comment
(detect_3d_cuboid/include/detect_3d_cuboid/detect_3d_cuboid.h:43-56:
pos (-1.583, 0.373, 0.301), config [1,1]).  To settle it, tools/ref_oracle
compiles the reference's own sources (box_proposal_detail.cpp /
object_3d_util.cpp / matrix_utils.cpp, unmodified, read-only) against
OpenCV 4.6 and runs the canonical demo (main.cpp:29-76 inputs).  The
from-source reference picks pos (-0.2557, 1.7545, 0.4630), config [1,2] —
i.e. the header comment is stale (recorded under an older OpenCV whose
Canny/chamfer output differed), and OUR winner matches the actual reference
behaviour to ~4e-5.  These tests pin that parity against the committed
stage-level dumps in tests/data/ref_oracle (see docs/ORACLE_PARITY.md).
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cube_slam_wu_tpu.ops import image as oimg
from cube_slam_wu_tpu.ops.proposal import ProposalConfig, detect_cuboid_single
from cube_slam_wu_tpu.utils import io as uio

ORACLE = pathlib.Path(__file__).parent / "data" / "ref_oracle"
FIXTURE = pathlib.Path("/root/reference/detect_3d_cuboid/data")

pytestmark = pytest.mark.skipif(
    not (ORACLE / "proposals.txt").exists() or not FIXTURE.exists(),
    reason="ref oracle dumps or reference fixture unavailable",
)


@pytest.fixture(scope="module")
def engine_run():
    gray = jnp.asarray(uio.load_image_gray(FIXTURE / "0000_rgb_raw.jpg"))
    edges = uio.read_number_txt(FIXTURE / "edge_detection/LSD/0000_edge.txt")
    K = np.array([[529.5, 0, 365.0], [0, 529.5, 265.0], [0, 0, 1.0]])
    T_wc = np.array(
        [
            [1, 0.0011, 0.0004, 0],
            [0, -0.3376, 0.9413, 0],
            [0.0011, -0.9413, -0.3376, 1.35],
            [0, 0, 0, 1.0],
        ]
    )
    bbox = np.array([187.0, 188.0, 201.0, 311.0])
    L = 320
    lines = np.zeros((L, 4))
    lines[: len(edges)] = edges[:, :4]
    mask = np.zeros(L, bool)
    mask[: len(edges)] = True
    res, intern = detect_cuboid_single(
        gray,
        jnp.asarray(K),
        jnp.asarray(T_wc),
        jnp.asarray(bbox),
        jnp.asarray(lines),
        jnp.asarray(mask),
        ProposalConfig(max_lines=L),
        return_internals=True,
    )
    res = jax.tree.map(np.asarray, res)
    intern = {k: np.asarray(v) for k, v in intern.items()}
    return gray, res, intern


def test_winner_matches_reference_build(engine_run):
    """Winner-level parity with the from-source reference binary."""
    _, res, _ = engine_run
    ref = np.loadtxt(ORACLE / "proposals.txt")
    top = ref[0]
    assert res.valid
    np.testing.assert_allclose(res.pos, top[0:3], atol=1e-3)
    np.testing.assert_allclose(res.scale, top[3:6], atol=1e-3)
    np.testing.assert_allclose(res.rotY, top[6], atol=1e-3)
    assert res.box_config_type.tolist() == [int(top[7]), int(top[8])]
    # scores shift slightly with the exact-EDT dist map (docs/ORACLE_PARITY.md)
    np.testing.assert_allclose(res.normalized_error, top[11], atol=0.02)
    np.testing.assert_allclose(res.edge_distance_error, top[9], atol=0.15)
    np.testing.assert_allclose(res.edge_angle_error, top[10], atol=0.05)
    # winner 2D corners within a pixel (reference rounds to int)
    ref_corners = top[13:29].reshape(8, 2).T
    np.testing.assert_allclose(res.corners_2d, ref_corners, atol=1.0)


def test_topk_ranking_matches_reference_build(engine_run):
    """Each of the reference's top-5 ranked proposals appears in our
    hypothesis grid with matching pose and score, in compatible rank order."""
    _, _, intern = engine_run
    ref = np.loadtxt(ORACLE / "proposals.txt")
    final = intern["final"].copy()
    order = np.argsort(final)
    ours_sorted = order[np.isfinite(final[order])]
    pos = intern["pos"]
    yaw = intern["yaw_grid"]
    nerr = intern["scores"]
    for rank in range(5):
        top = ref[rank]
        i = ours_sorted[rank]
        np.testing.assert_allclose(pos[i], top[0:3], atol=2e-3)
        assert abs(yaw[i] - top[6]) < 1e-3
        # fused scores shift slightly under the exact-EDT dist map
        assert abs(nerr[i] - top[11]) < 0.05


def test_canny_matches_opencv(engine_run):
    """ops.image.canny vs cv::Canny(gray(roi), 80, 200) on the demo ROI."""
    gray, _, _ = engine_run
    x0, y0, w, h = np.loadtxt(ORACLE / "roi.txt").astype(int)
    ref = np.loadtxt(ORACLE / "canny.txt") > 0
    buf = oimg.replicate_roi(gray, x0, y0, x0 + w - 1, y0 + h - 1)
    ours = np.asarray(oimg.canny(buf))[y0 : y0 + h, x0 : x0 + w]
    agree = (ref == ours).mean()
    assert agree > 0.999
    # every OpenCV edge pixel is one of ours (superset within 0.1%)
    assert np.logical_and(ref, ~ours).sum() <= 5


def test_dist_map_vs_opencv_chamfer(engine_run):
    """Our exact EDT vs OpenCV's 3x3 chamfer: bounded deviation (the chamfer
    is an approximation; deliberate difference — see docs/ORACLE_PARITY.md)."""
    gray, _, intern = engine_run
    x0, y0, w, h = np.loadtxt(ORACLE / "roi.txt").astype(int)
    ref = np.loadtxt(ORACLE / "dist_map.txt")
    ours = intern["dist_map"][y0 : y0 + h, x0 : x0 + w]
    diff = np.abs(ref - ours)
    assert diff.mean() < 0.5
    # near edges (the region proposal scoring actually samples) the two agree
    near = ref < 5.0
    assert diff[near].mean() < 0.15


def test_merged_lines_close_to_reference(engine_run):
    """merge_break_lines parity: most merged segments match endpoint-for-
    endpoint; the remainder differ only in how collinear chains are split
    (same underlying support pixels, documented in docs/ORACLE_PARITY.md)."""
    _, _, intern = engine_run
    ref = np.loadtxt(ORACLE / "lines_merged.txt")
    ours = intern["merged_lines"][intern["merged_mask"]]
    matched = 0
    for r in ref:
        if np.min(np.abs(ours - r).max(axis=1)) < 3.0:
            matched += 1
    assert matched / len(ref) >= 0.75
    assert abs(len(ours) - len(ref)) <= 3


def test_max_cuboid_num_api_topk(engine_run):
    """ObjectSet semantics (detect_3d_cuboid.h:95-96): max_cuboid_num=5
    returns the 5 best-ranked proposals with a leading rank axis, best
    first, each matching the from-source reference's ranked dump."""
    gray, res_single, _ = engine_run
    edges = uio.read_number_txt(FIXTURE / "edge_detection/LSD/0000_edge.txt")
    K = np.array([[529.5, 0, 365.0], [0, 529.5, 265.0], [0, 0, 1.0]])
    T_wc = np.array(
        [
            [1, 0.0011, 0.0004, 0],
            [0, -0.3376, 0.9413, 0],
            [0.0011, -0.9413, -0.3376, 1.35],
            [0, 0, 0, 1.0],
        ]
    )
    bbox = np.array([187.0, 188.0, 201.0, 311.0])
    L = 320
    lines = np.zeros((L, 4))
    lines[: len(edges)] = edges[:, :4]
    mask = np.zeros(L, bool)
    mask[: len(edges)] = True
    res = detect_cuboid_single(
        gray,
        jnp.asarray(K),
        jnp.asarray(T_wc),
        jnp.asarray(bbox),
        jnp.asarray(lines),
        jnp.asarray(mask),
        ProposalConfig(max_lines=L, max_cuboid_num=5),
    )
    res = jax.tree.map(np.asarray, res)
    assert res.pos.shape == (5, 3)
    assert res.valid.all()
    # rank 0 == the single-winner path
    np.testing.assert_allclose(res.pos[0], res_single.pos, atol=1e-12)
    np.testing.assert_allclose(res.rotY[0], res_single.rotY, atol=1e-12)
    # each rank matches the reference's ranked proposal dump
    ref = np.loadtxt(ORACLE / "proposals.txt")
    for rank in range(5):
        top = ref[rank]
        np.testing.assert_allclose(res.pos[rank], top[0:3], atol=2e-3)
        assert abs(res.rotY[rank] - top[6]) < 1e-3
        assert abs(res.normalized_error[rank] - top[11]) < 0.05
