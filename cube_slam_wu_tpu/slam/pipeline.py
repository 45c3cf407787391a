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

import jax
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


def _default_dtype():
    """float64 when x64 is enabled (CPU tests), else float32 (TPU backends
    without x64 support — avoids per-array truncation warnings)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def build_offline_frames(data: OfflineData, dtype=None) -> tracker.FrameInput:
    """Assemble per-frame measurement inputs from the offline txts
    (main_obj.cpp:682-736)."""
    dtype = dtype or _default_dtype()
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

    # single-landmark dataset -> object axis O = 1
    meas = Cuboid.from_minimal(jnp.asarray(meas9[:, None, :], dtype))
    return tracker.FrameInput(
        meas=meas,
        quality=jnp.asarray(quality[:, None], dtype),
        has_meas=jnp.asarray(has[:, None]),
        active=jnp.ones((n,), bool),
    )


def run_online_slam(
    base_folder,
    n_frames: int | None = None,
    iterations: int = 5,
    dtype=None,
    detect_cfg=None,
    proposal_overrides: dict | None = None,
    soft_gate_alpha: float | None = 2.0,
    refine_with_points: bool = False,
    use_yaw_prior: bool = False,
):
    """Full online mono pipeline over the reference dataset layout: per-frame
    line detection -> cuboid proposal -> measurement -> incremental BA
    (mirrors main_obj.cpp online branch, :585-679).

    The front-end runs for all frames up-front (reference semantics allow it:
    proposals for frames > 0 are generated around the FIRST camera pose with
    roll/pitch sampling, main_obj.cpp:624-628, so no tracker feedback enters
    the front-end), then the incremental graph scan consumes the
    measurements.

    `use_yaw_prior` threads each frame's accepted yaw into the next frame's
    hypothesis scoring (the reference's box_proposal_detail.cpp:178 TODO).
    Off by default: on the bundled sequence it locks onto early yaw errors
    and degrades ATE (0.186 -> 0.56 aligned); useful only with a stronger
    per-frame detector.
    """
    from cube_slam_wu_tpu.core import rotations as rotu
    from cube_slam_wu_tpu.ops.detect import DetectConfig, detect_line_segments
    from cube_slam_wu_tpu.ops.proposal import ProposalConfig, detect_cuboid_single

    dtype = dtype or _default_dtype()
    base = pathlib.Path(base_folder)
    truth = uio.read_number_txt(base / "truth_cam_poses.txt")
    n = truth.shape[0] if n_frames is None else min(n_frames, truth.shape[0])

    detect_cfg = detect_cfg or DetectConfig()
    over = dict(proposal_overrides or {})
    over.setdefault("nominal_skew_ratio", 2.0)  # main_obj.cpp:499
    K_np = np.array([[535.4, 0, 320.1], [0, 539.2, 247.6], [0, 0, 1.0]])

    first_Twc = SE3.from_xyzq(jnp.asarray(truth[0, 1:8], dtype))
    T0 = np.asarray(first_Twc.matrix())
    roll0, pitch0, yaw0 = (
        float(v) for v in rotu.rot_to_euler_zyx(jnp.asarray(T0[:3, :3]))
    )

    meas9 = np.zeros((n, 9))
    quality = np.zeros((n,))
    has = np.zeros((n,), bool)

    K = jnp.asarray(K_np, dtype)
    T0_j = jnp.asarray(T0, dtype)
    yaw_prior = None  # previous frame's accepted object yaw (temporal prior)

    for i in range(n):
        img_path = base / "raw_imgs" / f"{i:04d}_rgb_raw.jpg"
        yolo_path = base / "filter_2d_obj_txts" / f"{i:04d}_yolo2_0.15.txt"
        if not img_path.exists() or not yolo_path.exists():
            continue
        yolo = uio.read_number_txt(yolo_path)
        if yolo.size == 0:
            continue
        gray = jnp.asarray(uio.load_image_gray(img_path), dtype)
        lines, mask = detect_line_segments(gray, detect_cfg)
        cfg = ProposalConfig(
            max_lines=int(lines.shape[0]),
            sample_cam_roll_pitch=(i != 0),  # main_obj.cpp:624
            **over,
        )
        bbox = jnp.asarray(
            [yolo[0, 0] - 1.0, yolo[0, 1] - 1.0, yolo[0, 2], yolo[0, 3]], dtype
        )
        prior_arg = (
            jnp.asarray(yaw_prior, dtype)
            if (use_yaw_prior and yaw_prior is not None)
            else None
        )
        res = detect_cuboid_single(
            gray, K, T0_j, bbox, lines, mask, cfg, yaw_prior=prior_arg
        )
        res = jax.tree.map(np.asarray, res)
        if not bool(res.valid):
            continue
        yaw_prior = float(res.rotY)
        # ground-frame 9-DoF -> camera-frame measurement (main_obj.cpp:649-675)
        cube_ground = Cuboid.from_minimal(
            jnp.asarray(
                [*res.pos, 0.0, 0.0, float(res.rotY), *res.scale], dtype
            )
        )
        roll_new = roll0 + float(res.camera_roll_delta)
        pitch_new = pitch0 + float(res.camera_pitch_delta)
        R_new = rotu.euler_zyx_to_rot(
            jnp.asarray(roll_new, dtype), jnp.asarray(pitch_new, dtype), jnp.asarray(yaw0, dtype)
        )
        pose_used = SE3.from_rot_trans(R_new, jnp.asarray(T0[:3, 3], dtype))
        local = cube_ground.transform_to(pose_used)
        meas9[i] = np.asarray(local.to_minimal())
        quality[i] = (1.0 - float(res.normalized_error) + 0.5) / 2.0
        has[i] = True

    frames = tracker.FrameInput(
        meas=Cuboid.from_minimal(jnp.asarray(meas9[:, None, :], dtype)),
        quality=jnp.asarray(quality[:, None], dtype),
        has_meas=jnp.asarray(has[:, None]),
        active=jnp.ones((n,), bool),
    )
    graph, chi2s, cube_hist = tracker.run_incremental(
        first_Twc, frames, iterations=iterations, soft_gate_alpha=soft_gate_alpha
    )

    if refine_with_points:
        graph = _point_refinement(graph, base, n, K, dtype)

    traj = np.asarray(graph.cam_Twc().to_xyzq())
    cube = np.asarray(graph.cube.to_minimal())[0]
    return SlamOutput(
        traj_Twc_xyzq=traj,
        cube_minimal=cube,
        chi2=np.asarray(chi2s),
        timestamps=truth[:n, 0],
        cube_history=np.asarray(cube_hist),
    )


def _point_refinement(
    graph,
    base,
    n,
    K,
    dtype,
    max_corners: int = 192,
    outlier_px: float = 3.0,
    min_track_obs: int = 3,
    obs_weight: float = 0.05,
):
    """Joint camera-object-point polish after the incremental pass
    (BASELINE config 4: feature tracking + cuboid landmarks + joint BA).

    Harris+ZNCC tracks over the sequence are triangulated from the
    incremental trajectory; observations whose initial reprojection error
    exceeds `outlier_px` are dropped (ZNCC drift/mismatch gating), then one
    Schur-reduced LM refines poses, cuboids and points together.

    Note: on the bundled 58-frame cabinet sequence this polish does NOT
    improve ATE (0.234 -> 0.238 at the default gate) — the trajectory error
    there is dominated by cuboid-measurement bias, which world-frame-agnostic
    monocular points cannot correct, and the low-texture scene yields noisy
    ZNCC tracks.  It is therefore off by default; the machinery (tracking,
    exact DLT triangulation, joint Schur BA) is validated in tests."""
    import jax as jax_
    import jax.numpy as jnp_

    from cube_slam_wu_tpu.slam import features, point_ba
    from cube_slam_wu_tpu.slam.point_ba import PointFactors

    grays = []
    for i in range(n):
        p = base / "raw_imgs" / f"{i:04d}_rgb_raw.jpg"
        if not p.exists():
            return graph
        grays.append(jnp.asarray(uio.load_image_gray(p), dtype))
    obs_uv, obs_mask = features.build_point_tracks(grays, max_corners=max_corners)
    obs_uv = jnp.asarray(obs_uv, dtype)
    obs_mask = jnp.asarray(obs_mask)
    pts, ok = point_ba.triangulate_points(graph.cam_Tcw, obs_uv, obs_mask, K)

    # reprojection gating against the incremental trajectory
    proj = jax_.vmap(
        lambda T: jax_.vmap(lambda X: point_ba.project_point(T, X, K))(pts)
    )(graph.cam_Tcw)
    err = jnp.linalg.norm(proj - obs_uv, axis=-1)
    obs_ok = obs_mask & ok[None, :] & (err < outlier_px)
    track_ok = ok & (jnp.sum(obs_ok, axis=0) >= min_track_obs)
    obs_ok = obs_ok & track_ok[None, :]

    factors = PointFactors(
        points=pts,
        point_mask=track_ok,
        obs_uv=obs_uv,
        obs_mask=obs_ok,
        # pixel residuals vs unit-information odometry/cuboid edges
        obs_weight=jnp_.full(obs_mask.shape, obs_weight, dtype),
    )
    res = point_ba.optimize(graph, factors, K, iterations=8)
    return graph._replace(cam_Tcw=res.cam_Tcw, cube=res.cube)


class SlamOutput(NamedTuple):
    traj_Twc_xyzq: np.ndarray  # (N, 7) x y z qx qy qz qw
    cube_minimal: np.ndarray  # (9,) final cuboid [xyz rpy lwh]
    chi2: np.ndarray  # (N,) per-frame final chi2
    timestamps: np.ndarray
    cube_history: np.ndarray | None = None  # (N, O, 9) per-frame optimized


def run_offline_slam(base_folder, iterations: int = 5, dtype=None) -> SlamOutput:
    """Offline-mode incremental SLAM over the bundled dataset; returns the
    optimized trajectory (camera-to-world, TUM order) like
    output_cam_poses.txt."""
    dtype = dtype or _default_dtype()
    data = load_offline_dataset(base_folder)
    frames = build_offline_frames(data, dtype)
    first_Twc = SE3.from_xyzq(jnp.asarray(data.truth_poses[0, 1:8], dtype))
    graph, chi2s, cube_hist = tracker.run_incremental(
        first_Twc, frames, iterations=iterations
    )
    traj = np.asarray(graph.cam_Twc().to_xyzq())
    cube = np.asarray(graph.cube.to_minimal())[0]
    return SlamOutput(
        traj_Twc_xyzq=traj,
        cube_minimal=cube,
        chi2=np.asarray(chi2s),
        timestamps=data.truth_poses[:, 0],
        cube_history=np.asarray(cube_hist),
    )
