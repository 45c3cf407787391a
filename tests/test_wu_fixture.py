"""BASELINE config 1: single-image cuboid proposal on the author's extra
fixture `wu/0005_rgb_raw.jpg` + its YOLO box.

BASELINE.json's first benchmark config names exactly this input (see
BASELINE.md "configs to reproduce"); the reference would run it through
`detect_3d_cuboid_node` (detect_3d_cuboid/src/main.cpp semantics) with the
SLAM driver's calibration (main_obj.cpp:484-486) and a TUM fr3 camera pose.
The wu frames are extra draws of the same fr3 "cabinet" scene, so the
bundled pop cam pose (x=y=0, truth roll/pitch/height — the pose the online
driver feeds the proposal engine, main_obj.cpp:624-628) is the right ground
prior.  No golden output exists for this image, so the gate is structural:
the full online path (line detection -> hypothesis grid -> fusion ->
lifting) must produce a valid, well-formed cabinet-scale cuboid.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from cube_slam_wu_tpu.core.se3 import SE3
from cube_slam_wu_tpu.ops.detect import detect_line_segments
from cube_slam_wu_tpu.ops.proposal import (
    ProposalConfig,
    detect_cuboid_single,
)
from cube_slam_wu_tpu.utils import io as uio

WU = "/root/reference/wu/"
SLAM_DATA = "/root/reference/object_slam/data/"
# main_obj.cpp:484-486 calibration (the wu frames come from the same run)
K = np.array([[535.4, 0, 320.1], [0, 539.2, 247.6], [0, 0, 1.0]])


@pytest.fixture(scope="module")
def wu_inputs(reference_root):
    gray = uio.load_image_gray(WU + "0005_rgb_raw.jpg")
    boxes, conf, mask = uio.read_detections_txt(WU + "0005_yolo2_0.15.txt")
    pop = uio.read_number_txt(SLAM_DATA + "pop_cam_poses_saved.txt")
    T_wc = np.asarray(SE3.from_xyzq(jnp.asarray(pop[0, 1:8])).matrix())
    return gray, boxes, conf, mask, T_wc


def test_wu_0005_input_sanity(wu_inputs):
    """Fixture-data sanity lives in its own test (not inside the module
    fixtures) so input drift reports as ONE clear failure instead of an
    ERROR in every dependent test."""
    gray, boxes, conf, mask, T_wc = wu_inputs
    assert mask.sum() == 1 and conf[0] == pytest.approx(0.40)
    _, lmask = detect_line_segments(jnp.asarray(gray))
    assert int(jnp.sum(lmask)) >= 30  # textured VGA frame


@pytest.fixture(scope="module")
def wu_proposal(wu_inputs):
    gray, boxes, conf, mask, T_wc = wu_inputs
    lines, lmask = detect_line_segments(jnp.asarray(gray))
    cfg = ProposalConfig(max_lines=int(lines.shape[0]))
    res = detect_cuboid_single(
        jnp.asarray(gray),
        jnp.asarray(K),
        jnp.asarray(T_wc),
        jnp.asarray(boxes[0]),
        lines,
        lmask,
        cfg,
    )
    return jax_to_np(res)


def jax_to_np(tree):
    import jax

    return jax.tree.map(np.asarray, tree)


def test_wu_0005_proposal_valid_and_well_formed(wu_proposal):
    res = wu_proposal
    assert bool(res.valid)
    assert np.isfinite(res.normalized_error)
    # cabinet-scale object (half-extents, metres) standing on the ground
    assert np.all(res.scale > 0.03) and np.all(res.scale < 1.5), res.scale
    # in front of the camera, within the room
    assert np.linalg.norm(res.pos[:2]) < 5.0, res.pos
    assert np.isfinite(res.rotY)
    # projected corners land inside the image frame (with slack for the
    # hidden back corners)
    assert np.all(res.corners_2d[0] > -120) and np.all(
        res.corners_2d[0] < 640 + 120
    )


def test_wu_0005_topk_rank0_is_the_single_winner(wu_inputs, wu_proposal):
    gray, boxes, _, _, T_wc = wu_inputs
    lines, lmask = detect_line_segments(jnp.asarray(gray))
    cfg = ProposalConfig(max_lines=int(lines.shape[0]), max_cuboid_num=3)
    res = jax_to_np(
        detect_cuboid_single(
            jnp.asarray(gray),
            jnp.asarray(K),
            jnp.asarray(T_wc),
            jnp.asarray(boxes[0]),
            lines,
            lmask,
            cfg,
        )
    )
    assert bool(res.valid[0])
    np.testing.assert_allclose(res.pos[0], wu_proposal.pos, rtol=1e-6)
    np.testing.assert_allclose(res.rotY[0], wu_proposal.rotY, rtol=1e-6)
    # ranked: errors non-decreasing over the valid prefix
    errs = res.normalized_error[res.valid]
    assert np.all(np.diff(errs) >= -1e-9), errs
