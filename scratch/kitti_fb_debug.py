"""Why does tracked mode only measure one slot on the 16-frame clip?"""
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

seq0 = synth.make_sequence(n_frames=16, n_objects=3, size=(240, 320),
                           speed=0.35, noise_px=0.5)
out, det_dir, poses_path = synth.write_kitti_sequence(seq0, "/tmp/kfbdbg")
seq = ukitti.load_sequence(out, poses_path)
for gate in (3.0, None):
    r = pipeline._run_kitti_tracked(
        seq, 16, jnp.float64, iterations=5, detect_cfg=None,
        proposal_overrides=None, soft_gate_alpha=2.0, max_objects=4,
        max_detections=3, min_iou=0.25, window=8, robust_delta=None,
        bbox_edge_weight=0.0, track_max_age=12, detections_dir=det_dir,
        spawn_range_m=15.0, min_meas=1, assoc_gate_m=gate)
    print(f"gate={gate}: valid={np.asarray(r.cube_valid).astype(int)} "
          f"report=({r.frontend_report.summary()})", flush=True)
    # per-slot measurement count from cube_history activity
print("detections per frame:", [len(d) for d in seq0.detections])
