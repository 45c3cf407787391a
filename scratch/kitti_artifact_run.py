"""Produce the committed KITTI-format run artifact (VERDICT item 2):
300-frame 6-object synthetic sequence -> full multi-object online pipeline
(windowed back-end) -> trajectory + object poses + report."""
import os, sys, time, pathlib
import jax
os.environ["JAX_PLATFORMS"] = "cpu"
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, "/root/repo")
import numpy as np
from cube_slam_wu_tpu.utils import synth
from cube_slam_wu_tpu.slam import pipeline
from cube_slam_wu_tpu.utils.metrics import ate_rmse, rpe_rmse

N = 300
seq = synth.make_sequence(n_frames=N, n_objects=6, size=(240, 320),
                          speed=0.5, curve=0.002, noise_px=0.8, dropout=0.05,
                          seed=4)
out, det_dir, poses_path = synth.write_kitti_sequence(seq, "/tmp/kitti_long")
t0 = time.time()
result = pipeline.run_kitti_slam(out, det_dir, poses_path,
                                 max_objects=8, max_detections=4, window=16,
                                 checkpoint_path="/tmp/kitti_long_fe.npz",
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
# landmark position errors (nearest-gt match)
errs = []
for c in cubes[valid]:
    errs.append(np.linalg.norm(gt_obj[:, :3] - c[:3], axis=1).min())
report = f"""# Synthetic KITTI-format 300-frame run (committed artifact)

Command: scratch/kitti_artifact_run.py (utils.synth world, KITTI odometry
layout, run via slam.pipeline.run_kitti_slam — the same code path as
`cli kitti`).

- frames: {N}, objects in world: 6, detector dropout 5%, bbox noise 0.8 px
- back-end: fixed-lag window = 16 (O(W) per frame at any sequence length)
- association gates (driver defaults): track_max_age=12, depth_gate_m=2.5,
  spawn_range_m=auto (= sqrt(0.6 * f * h_cam) = 15.4 m at this camera),
  min_meas=2 — without them, 2D-IoU-only tracking builds chimera tracks on
  forward drives (this exact run measured ATE 12.4 m with 21-34 m landmark
  errors before the gates)
- ATE RMSE vs ground truth: **{ate:.4f} m** over a {seq.T_wc[:N,:3,3][-1][1]:.0f} m forward run
- landmarks spawned: {int(valid.sum())} / 6 (position error to nearest gt: {", ".join(f"{e:.2f}" for e in errs)} m)
- wall clock (CPU f64, incl. compile): {wall:.0f} s

Files: output_cam_poses.txt (t x y z qx qy qz qw), output_obj_poses.txt
(x y z r p y l w h per landmark).
"""
(art / "REPORT.md").write_text(report)
print(report)
