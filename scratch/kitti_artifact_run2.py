"""Regenerate the committed KITTI-format artifact (round 2, after the
fixed-lag prior fix and point landmarks): 300-frame 6-object synthetic
drive -> interleaved multi-object pipeline with joint point BA."""
import os, sys, time, pathlib
import jax
os.environ["JAX_PLATFORMS"] = "cpu"
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, "/root/repo")
import numpy as np
from cube_slam_wu_tpu.utils import synth
from cube_slam_wu_tpu.slam import pipeline
from cube_slam_wu_tpu.utils.metrics import ate_rmse

N = 300
seq = synth.make_sequence(n_frames=N, n_objects=6, size=(240, 320),
                          speed=0.5, curve=0.002, noise_px=0.8, dropout=0.05,
                          seed=4, ground_texture=4.0)
out, det_dir, poses_path = synth.write_kitti_sequence(seq, "/tmp/kitti_long2")
t0 = time.time()
result = pipeline.run_kitti_slam(out, det_dir, poses_path,
                                 max_objects=8, max_detections=4, window=16,
                                 pose_feedback=True, point_weight=0.3,
                                 checkpoint_path="/tmp/kitti_long2_fe.npz",
                                 checkpoint_every=50)
wall = time.time() - t0
traj = np.asarray(result.traj_Twc_xyzq)
gt = seq.T_wc[:N, :3, 3]
ate = ate_rmse(traj[:N, :3], gt)
art = pathlib.Path("/root/repo/artifacts/kitti_synth_300")
art.mkdir(parents=True, exist_ok=True)
np.savetxt(art / "output_cam_poses.txt",
           np.column_stack([seq.timestamps[:N], traj[:N]]), fmt="%.6f")
cubes = np.asarray(result.cubes_minimal)
valid = np.asarray(result.cube_valid)
np.savetxt(art / "output_obj_poses.txt", cubes[valid], fmt="%.6f")
gt_obj = np.stack([np.concatenate([o.pos, [0, 0, o.yaw], o.scale]) for o in seq.objects])
errs = [float(np.linalg.norm(gt_obj[:, :3] - c[:3], axis=1).min()) for c in cubes[valid]]
path_len = float(np.linalg.norm(np.diff(gt, axis=0), axis=1).sum())
report = f"""# Synthetic KITTI-format 300-frame run (committed artifact)

Command: scratch/kitti_artifact_run2.py (utils.synth world with
world-anchored ground speckle, KITTI odometry layout, run via
slam.pipeline.run_kitti_slam — the same code path as `cli kitti
--pose-feedback --point-weight 0.3`).

- frames: {N} ({path_len:.1f} m path), objects in world: 6, detector
  dropout 5%, bbox noise 0.8 px, ground texture amplitude 4 gray levels
- back-end: fixed-lag window = 16, interleaved front-end (proposals at the
  tracker's predicted pose), joint camera+cuboid+POINT bundle adjustment
  (96 Harris+ZNCC track slots, ground-plane bootstrap, weight 0.3)
- association gates (driver defaults): track_max_age=12, spawn_range=auto,
  assoc_gate_m=3, min_meas=2
- ATE RMSE vs ground truth: **{ate:.4f} m**
- landmarks: {int(valid.sum())} / 6 (position error to nearest gt: {", ".join(f"{e:.2f}" for e in errs)} m)
- wall clock (CPU f64, incl. compile): {wall:.0f} s

Ablation history on this world (120-frame prefix unless noted):

| configuration | ATE |
|---|---|
| 2D-IoU-only association, no gates (300 fr) | 12.42 m |
| + association gates (age/depth/spawn/min-meas) (300 fr) | 3.17 m |
| + fixed-lag prior guards (window.absorb_frame absorb_gate/info_cap) | 2.19-2.43 m |
| interleaved, cuboid-only (prior guards, no points) | 7.26-20.3 m |
| interleaved + joint point BA w=0.3 (this artifact, 300 fr) | **{ate:.2f} m** |

The prior guards matter everywhere (before them, one degenerate edge
absorption froze the whole windowed back-end — see test_point_window.py);
the interleaved mode NEEDS points (pose feedback compounds drift when the
only motion information is per-frame object observations), and with them
it is the strongest configuration.

Files: output_cam_poses.txt (t x y z qx qy qz qw), output_obj_poses.txt
(x y z r p y l w h per landmark).
"""
(art / "REPORT.md").write_text(report)
print(report)
