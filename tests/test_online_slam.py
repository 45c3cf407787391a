"""End-to-end ONLINE mono SLAM on the bundled 58-frame TUM dataset.

BASELINE config 4: full front-end (Hough line detection -> cuboid proposal
grid) feeding the incremental LM graph, trajectory compared against ground
truth and the reference's committed online-mode output.  The front-end is the
slow part on the CPU test backend, so this runs a 20-frame prefix; the full
58-frame run is exercised by scratch drives / bench and tracked in the
verification reports.
"""

import numpy as np
import pytest

from cube_slam_wu_tpu.slam.pipeline import run_online_slam
from cube_slam_wu_tpu.utils import io as uio
from cube_slam_wu_tpu.utils.metrics import ate_rmse

pytestmark = pytest.mark.slow

BASE = "/root/reference/object_slam/data/"
N = 20


@pytest.fixture(scope="module")
def online_output(reference_root):
    return run_online_slam(BASE, n_frames=N)


def test_online_ate_within_reference_band(online_output, reference_root):
    truth = uio.read_number_txt(BASE + "truth_cam_poses.txt")[:N]
    ref_out = uio.read_number_txt(BASE + "output_cam_poses.txt")[:N]
    est = online_output.traj_Twc_xyzq[:, :3]
    ours = ate_rmse(est, truth[:, 1:4])
    ref = ate_rmse(ref_out[:, 1:4], truth[:, 1:4])
    # parity requirement on the prefix: within 1.5x of the reference's error
    # on the same frames (full-sequence parity is tracked in scratch runs)
    assert ours <= max(ref * 1.3, 0.12), (ours, ref)


def test_online_cuboid_plausible(online_output, reference_root):
    """The optimized cuboid should localize the cabinet near the reference's
    committed object pose."""
    ref_obj = uio.read_number_txt(BASE + "output_obj_poses.txt")[-1]
    cube = online_output.cube_minimal
    assert np.linalg.norm(cube[:3] - ref_obj[:3]) < 0.35, (cube[:3], ref_obj[:3])
    assert np.all(cube[6:9] > 0.1) and np.all(cube[6:9] < 0.8)


def test_online_chi2_finite(online_output, reference_root):
    assert np.all(np.isfinite(online_output.chi2))
