"""Isolate the tracked-mode ATE gap: predicted-pose proposals vs the
interleaved loop itself.  Monkeypatch the prediction to the fixed pose."""
import os, sys
import jax
os.environ["JAX_PLATFORMS"] = "cpu"
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp
from cube_slam_wu_tpu.utils import synth
from cube_slam_wu_tpu.slam import pipeline as pl
from cube_slam_wu_tpu.utils import kitti as ukitti
from cube_slam_wu_tpu.utils.metrics import ate_rmse

TWO_OBJECTS = [
    synth.SynthObject(np.array([-1.5, 5.5, 0.45]), 1.7, np.array([0.7, 0.45, 0.45])),
    synth.SynthObject(np.array([1.6, 7.5, 0.6]), 0.3, np.array([0.9, 0.5, 0.6])),
]
seq0 = synth.make_sequence(n_frames=12, size=(240, 320), speed=0.35,
                           noise_px=0.5, objects=TWO_OBJECTS)
out, det_dir, poses_path = synth.write_kitti_sequence(seq0, "/tmp/kfbiso")
gt = seq0.T_wc[:12, :3, 3]

# 1. two-phase baseline
r = pl.run_kitti_slam(out, det_dir, poses_path, max_objects=4,
                      max_detections=3, window=8, min_meas=1)
print("two-phase:", round(float(ate_rmse(np.asarray(r.traj_Twc_xyzq)[:, :3], gt)), 3))

# 2. tracked as-is
r = pl.run_kitti_slam(out, det_dir, poses_path, max_objects=4,
                      max_detections=3, window=8, min_meas=1,
                      pose_feedback=True)
print("tracked(pred):", round(float(ate_rmse(np.asarray(r.traj_Twc_xyzq)[:, :3], gt)), 3))

# 3. tracked with full graph (window=None)
r = pl.run_kitti_slam(out, det_dir, poses_path, max_objects=4,
                      max_detections=3, window=None, min_meas=1,
                      pose_feedback=True)
print("tracked(pred,fullgraph):", round(float(ate_rmse(np.asarray(r.traj_Twc_xyzq)[:, :3], gt)), 3))

# 4. two-phase with window=None
r = pl.run_kitti_slam(out, det_dir, poses_path, max_objects=4,
                      max_detections=3, window=None, min_meas=1)
print("two-phase(fullgraph):", round(float(ate_rmse(np.asarray(r.traj_Twc_xyzq)[:, :3], gt)), 3))
