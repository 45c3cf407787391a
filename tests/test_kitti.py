"""KITTI dataset plumbing tests (synthetic fixture files)."""

import numpy as np

from cube_slam_wu_tpu.utils import kitti


def _write_seq(tmp_path):
    seq = tmp_path / "00"
    (seq / "image_0").mkdir(parents=True)
    calib = (
        "P0: 718.856 0 607.1928 0 0 718.856 185.2157 0 0 0 1 0\n"
        "P1: 718.856 0 607.1928 -386.1448 0 718.856 185.2157 0 0 0 1 0\n"
    )
    (seq / "calib.txt").write_text(calib)
    (seq / "times.txt").write_text("\n".join(f"{0.1 * i:.6f}" for i in range(5)))
    # identity + forward motion along kitti z (camera forward)
    rows = []
    for i in range(5):
        T = np.eye(4)[:3]
        T[2, 3] = 0.8 * i  # move forward
        rows.append(" ".join(f"{v:.6f}" for v in T.reshape(-1)))
    poses = tmp_path / "00.txt"
    poses.write_text("\n".join(rows))
    return seq, poses


def test_parse_calib(tmp_path):
    seq, _ = _write_seq(tmp_path)
    K = kitti.parse_calib(seq / "calib.txt")
    np.testing.assert_allclose(K[0, 0], 718.856)
    np.testing.assert_allclose(K[0, 2], 607.1928)
    np.testing.assert_allclose(K[2], [0, 0, 1])


def test_parse_poses_zup(tmp_path):
    _, poses_path = _write_seq(tmp_path)
    T = kitti.parse_poses(poses_path)
    assert T.shape == (5, 4, 4)
    # forward motion (kitti z) becomes y motion in the z-up world
    np.testing.assert_allclose(T[4, 1, 3], 0.8 * 4, atol=1e-9)
    # camera stays CAMERA_HEIGHT_M above ground
    np.testing.assert_allclose(T[:, 2, 3], kitti.CAMERA_HEIGHT_M, atol=1e-9)
    # rotations stay orthonormal with determinant +1
    R = T[:, :3, :3]
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (5, 1, 1)), atol=1e-9)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-9)
    # camera optical axis (kitti z, third column) is horizontal in z-up world
    np.testing.assert_allclose(R[:, 2, 2], 0.0, atol=1e-9)


def test_load_sequence(tmp_path):
    seq, poses_path = _write_seq(tmp_path)
    s = kitti.load_sequence(seq, poses_path)
    assert s.K.shape == (3, 3)
    assert s.poses_T_wc.shape == (5, 4, 4)
    assert len(s.timestamps) == 5
    assert kitti.detection_txt_path("dets", 7).name == "000007.txt"
