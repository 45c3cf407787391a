"""Pipeline-parallel front-end (parallel/pipelined.py): line detection and
cuboid proposal as stages on separate devices must produce EXACTLY the
sequential per-frame results (same ops, only the schedule changes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cube_slam_wu_tpu.ops.detect import DetectConfig, detect_line_segments
from cube_slam_wu_tpu.ops.proposal import ProposalConfig, detect_cuboid_single
from cube_slam_wu_tpu.parallel.pipelined import make_pipelined_frontend
from cube_slam_wu_tpu.parallel.sharded_ba import make_mesh
from cube_slam_wu_tpu.utils import synth


@pytest.fixture(scope="module")
def stream():
    """Short synthetic frame stream with a fully-visible cuboid."""
    obj = synth.SynthObject(
        np.array([0.3, 3.8, 0.42]), 0.45, np.array([0.55, 0.4, 0.42])
    )
    seq = synth.make_sequence(
        n_frames=5, size=(192, 256), speed=0.15, noise_px=0.0, objects=[obj]
    )
    grays = np.stack(
        [img if img.ndim == 2 else img.mean(axis=2) for img in seq.images]
    ).astype(np.float32)
    bboxes = np.stack(
        [
            [d[0, 0] - 1.0, d[0, 1] - 1.0, d[0, 2], d[0, 3]]
            for d in seq.detections
        ]
    ).astype(np.float32)
    return seq, grays, bboxes


def test_pipelined_matches_sequential(stream):
    seq, grays, bboxes = stream
    det_cfg = DetectConfig(n_peaks=96, runs_per_peak=4)
    mesh = make_mesh(2)
    run = make_pipelined_frontend(
        mesh, seq.K, synth.camera_pose(0.0), detect_cfg=det_cfg
    )
    piped = jax.tree.map(np.asarray, run(grays, bboxes))

    L = det_cfg.n_peaks * det_cfg.runs_per_peak
    prop_cfg = ProposalConfig(max_lines=L, rank_margin=2e-3, bilinear_dist=True)
    Kj = jnp.asarray(seq.K, jnp.float32)
    Tj = jnp.asarray(synth.camera_pose(0.0), jnp.float32)
    for t in range(len(grays)):
        g = jnp.asarray(grays[t])
        lines, mask = detect_line_segments(g, det_cfg)
        ref = detect_cuboid_single(
            g, Kj, Tj, jnp.asarray(bboxes[t]), lines, mask, prop_cfg
        )
        assert bool(piped.valid[t]) == bool(ref.valid), f"frame {t}"
        if bool(ref.valid):
            np.testing.assert_array_equal(
                piped.pos[t], np.asarray(ref.pos), err_msg=f"frame {t}"
            )
            np.testing.assert_array_equal(piped.scale[t], np.asarray(ref.scale))
            np.testing.assert_array_equal(piped.rotY[t], np.asarray(ref.rotY))
    assert np.asarray(piped.valid).any(), "no frame produced a valid cuboid"


def test_rejects_wrong_stage_count(stream):
    seq, _, _ = stream
    with pytest.raises(ValueError):
        make_pipelined_frontend(make_mesh(4), seq.K, synth.camera_pose(0.0))


def test_pipelined_per_frame_poses(stream):
    """Per-frame camera poses (the interleaved pose_feedback contract,
    VERDICT r2 item 6): each frame's proposal stage must anchor at ITS
    pose and equal the sequential per-frame run exactly."""
    seq, grays, bboxes = stream
    det_cfg = DetectConfig(n_peaks=96, runs_per_peak=4)
    mesh = make_mesh(2)
    run = make_pipelined_frontend(
        mesh, seq.K, synth.camera_pose(0.0), detect_cfg=det_cfg
    )
    # the sequence's true (moving) poses — distinct per frame
    T_wcs = np.stack([seq.T_wc[t] for t in range(len(grays))]).astype(
        np.float32
    )
    assert not np.allclose(T_wcs[0], T_wcs[-1])  # poses actually vary
    piped = jax.tree.map(np.asarray, run(grays, bboxes, T_wcs))

    L = det_cfg.n_peaks * det_cfg.runs_per_peak
    prop_cfg = ProposalConfig(max_lines=L, rank_margin=2e-3, bilinear_dist=True)
    Kj = jnp.asarray(seq.K, jnp.float32)
    n_valid = 0
    for t in range(len(grays)):
        g = jnp.asarray(grays[t])
        lines, mask = detect_line_segments(g, det_cfg)
        ref = detect_cuboid_single(
            g, Kj, jnp.asarray(T_wcs[t]), jnp.asarray(bboxes[t]), lines,
            mask, prop_cfg,
        )
        assert bool(piped.valid[t]) == bool(ref.valid), f"frame {t}"
        if bool(ref.valid):
            n_valid += 1
            np.testing.assert_array_equal(
                piped.pos[t], np.asarray(ref.pos), err_msg=f"frame {t}"
            )
            np.testing.assert_array_equal(piped.rotY[t], np.asarray(ref.rotY))
    assert n_valid >= 3, "need multiple valid frames for a meaningful check"
