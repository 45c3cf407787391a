"""End-to-end SLAM pipelines over the reference dataset layout.

Offline mode replays precomputed cuboid detections
(detect_cuboids_saved.txt + pop_cam_poses_saved.txt, mirroring
object_slam/src/main_obj.cpp:682-722 and main():844-904); online mode runs
the full front-end (lines -> proposals) per frame.  Data paths follow the
reference `object_slam/data/` contract.
"""

from __future__ import annotations

import pathlib
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from cube_slam_wu_tpu.core.cuboid import Cuboid
from cube_slam_wu_tpu.core.se3 import SE3
from cube_slam_wu_tpu.slam import tracker
from cube_slam_wu_tpu.utils import io as uio


class OfflineData(NamedTuple):
    pred_objects: np.ndarray  # rows: frame x y z yaw l w h err
    init_poses: np.ndarray  # rows: t x y z qx qy qz qw (pop cam poses)
    truth_poses: np.ndarray  # rows: t x y z qx qy qz qw


def load_offline_dataset(base_folder) -> OfflineData:
    base = pathlib.Path(base_folder)
    return OfflineData(
        pred_objects=uio.read_number_txt(base / "detect_cuboids_saved.txt"),
        init_poses=uio.read_number_txt(base / "pop_cam_poses_saved.txt"),
        truth_poses=uio.read_number_txt(base / "truth_cam_poses.txt"),
    )


def build_offline_frames(data: OfflineData, dtype=jnp.float64) -> tracker.FrameInput:
    """Assemble per-frame measurement inputs from the offline txts
    (main_obj.cpp:682-736)."""
    n = data.truth_poses.shape[0]
    meas9 = np.zeros((n, 9))
    quality = np.zeros((n,))
    has = np.zeros((n,), bool)

    by_frame = {int(r[0]): r for r in data.pred_objects}
    for i in range(n):
        row = by_frame.get(i)
        if row is None:
            continue
        cube_pose = np.array(
            [row[1], row[2], row[3], 0.0, 0.0, row[4], row[5], row[6], row[7]]
        )
        cam_pop = SE3.from_xyzq(jnp.asarray(data.init_poses[i, 1:8], dtype))
        cube_ground = Cuboid.from_minimal(jnp.asarray(cube_pose, dtype))
        local = cube_ground.transform_to(cam_pop)
        meas9[i] = np.asarray(local.to_minimal())
        quality[i] = (1.0 - row[8] + 0.5) / 2.0
        has[i] = True

    meas = Cuboid.from_minimal(jnp.asarray(meas9, dtype))
    return tracker.FrameInput(
        meas=meas,
        quality=jnp.asarray(quality, dtype),
        has_meas=jnp.asarray(has),
        active=jnp.ones((n,), bool),
    )


class SlamOutput(NamedTuple):
    traj_Twc_xyzq: np.ndarray  # (N, 7) x y z qx qy qz qw
    cube_minimal: np.ndarray  # (9,) final cuboid [xyz rpy lwh]
    chi2: np.ndarray  # (N,) per-frame final chi2
    timestamps: np.ndarray


def run_offline_slam(base_folder, iterations: int = 5, dtype=jnp.float64) -> SlamOutput:
    """Offline-mode incremental SLAM over the bundled dataset; returns the
    optimized trajectory (camera-to-world, TUM order) like
    output_cam_poses.txt."""
    data = load_offline_dataset(base_folder)
    frames = build_offline_frames(data, dtype)
    first_Twc = SE3.from_xyzq(jnp.asarray(data.truth_poses[0, 1:8], dtype))
    graph, chi2s = tracker.run_incremental(first_Twc, frames, iterations=iterations)
    traj = np.asarray(graph.cam_Twc().to_xyzq())
    cube = np.asarray(graph.cube.to_minimal())
    return SlamOutput(
        traj_Twc_xyzq=traj,
        cube_minimal=cube,
        chi2=np.asarray(chi2s),
        timestamps=data.truth_poses[:, 0],
    )
