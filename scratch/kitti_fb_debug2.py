"""Instrument associate_detections calls in tracked vs two-phase mode."""
import os, sys
import jax
os.environ["JAX_PLATFORMS"] = "cpu"
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp
from cube_slam_wu_tpu.utils import synth
from cube_slam_wu_tpu.slam import pipeline
from cube_slam_wu_tpu.utils import kitti as ukitti
from cube_slam_wu_tpu.ops import association as assoc

orig = assoc.associate_detections
def spy(track_bbox, track_alive, boxes, det_valid, min_iou=0.3):
    out = orig(track_bbox, track_alive, boxes, det_valid, min_iou=min_iou)
    print(f"  assoc: alive={np.asarray(track_alive).astype(int)} "
          f"det_valid={np.asarray(det_valid).astype(int)} "
          f"matched={np.asarray(out[1]).astype(int)} "
          f"new={np.asarray(out[2]).astype(int)}", flush=True)
    return out

seq0 = synth.make_sequence(n_frames=6, n_objects=3, size=(240, 320),
                           speed=0.35, noise_px=0.5)
out, det_dir, poses_path = synth.write_kitti_sequence(seq0, "/tmp/kfbdbg2")
seq = ukitti.load_sequence(out, poses_path)

import cube_slam_wu_tpu.slam.pipeline as pl
print("=== tracked mode ===")
assoc.associate_detections = spy
# pipeline imported associate_detections inside functions via from-import:
# patch the module attribute it resolves at call time
r = pl._run_kitti_tracked(
    seq, 6, jnp.float64, iterations=5, detect_cfg=None,
    proposal_overrides=None, soft_gate_alpha=2.0, max_objects=4,
    max_detections=3, min_iou=0.25, window=None, robust_delta=None,
    bbox_edge_weight=0.0, track_max_age=12, detections_dir=det_dir,
    spawn_range_m=15.0, min_meas=1, assoc_gate_m=None)
print("valid:", np.asarray(r.cube_valid).astype(int))
print("=== two-phase ===")
r2 = pl.run_kitti_slam(out, det_dir, poses_path, n_frames=6, max_objects=4,
                       max_detections=3, min_meas=1, spawn_range_m=15.0)
print("valid:", np.asarray(r2.cube_valid).astype(int))
