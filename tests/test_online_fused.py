"""Fused single-dispatch online step (slam/online.py) gates.

The fused step moves association, tracklet bookkeeping, measurement
assembly and the incremental BA into ONE jitted dispatch per frame
(round-5 verdict item 1: collapse the online per-frame step to <= 2 host
syncs).  These tests pin:

- equivalence with the two-phase driver (run_online_frontend +
  run_incremental) on a real TUM prefix — same trajectory to f32
  measurement-assembly round-off;
- the transfer contract: exactly 1 blocking sync per frame, image-up /
  pose-down only;
- (slow) the full 58-frame online ATE gate at the two-phase path's level.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from cube_slam_wu_tpu.slam.online import run_online_slam_fused
from cube_slam_wu_tpu.utils import io as uio
from cube_slam_wu_tpu.utils.metrics import ate_rmse

BASE = "/root/reference/object_slam/data"


@pytest.fixture(scope="module")
def fused_prefix(reference_root):
    return run_online_slam_fused(BASE, n_frames=6, dtype=jnp.float32)


def test_fused_matches_two_phase_prefix(reference_root, fused_prefix):
    from cube_slam_wu_tpu.slam.pipeline import run_online_slam

    ref = run_online_slam(BASE, n_frames=6, dtype=jnp.float32)
    d = np.abs(
        fused_prefix.traj_Twc_xyzq - np.asarray(ref.traj_Twc_xyzq)
    ).max()
    # the only difference is measurement assembly in device f32 vs host
    # f64-intermediate (pipeline._proposal_measurement); everything else
    # (detector, proposals, association, BA) is the same compiled code
    assert d < 5e-4, d
    dc = np.abs(fused_prefix.cubes_minimal[0] - np.asarray(ref.cube_minimal)).max()
    assert dc < 5e-4, dc


def test_fused_transfer_contract(reference_root, fused_prefix):
    assert fused_prefix.syncs_per_frame == 1.0
    # image (480x640 uint8) + boxes up; pose + report scalars down
    assert fused_prefix.bytes_up_per_frame < 0.35e6
    assert fused_prefix.bytes_down_per_frame < 200
    assert fused_prefix.report["cap_fallbacks"] == 0


def test_fused_empty_detection_frame(reference_root):
    """Frame 20 of the bundled sequence has an empty detection file; the
    fused step must process it as a measurement-free frame (pose from
    constant-velocity + odometry only), like the two-phase driver."""
    out = run_online_slam_fused(BASE, n_frames=22, dtype=jnp.float32)
    assert out.report["no_valid_proposal"] >= 1
    assert np.isfinite(out.traj_Twc_xyzq).all()


@pytest.mark.slow
def test_fused_full_online_ate_gate(reference_root):
    truth = uio.read_number_txt(BASE + "/truth_cam_poses.txt")
    ref_out = uio.read_number_txt(BASE + "/output_cam_poses.txt")
    ate_ref = ate_rmse(ref_out[: len(truth), 1:4], truth[:, 1:4])
    result = run_online_slam_fused(BASE, dtype=jnp.float32)
    ate = ate_rmse(result.traj_Twc_xyzq[:, :3], truth[:, 1:4])
    assert np.isfinite(ate)
    # the two-phase default config measures 0.1789; the fused path must hold
    # the same beat-the-reference margin
    assert ate <= ate_ref * 0.9, f"fused online ATE {ate:.4f} vs ref {ate_ref:.4f}"
    assert result.syncs_per_frame == 1.0
