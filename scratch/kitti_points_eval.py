"""Evaluate the prior fix + point landmarks on a synthetic KITTI drive."""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, "/root/repo")
import numpy as np
from cube_slam_wu_tpu.utils import synth
from cube_slam_wu_tpu.slam import pipeline
from cube_slam_wu_tpu.utils.metrics import ate_rmse

N = int(os.environ.get("N_FRAMES", 120))
seq = synth.make_sequence(n_frames=N, n_objects=6, size=(240, 320),
                          speed=0.5, curve=0.002, noise_px=0.8, dropout=0.05,
                          seed=4,
                          ground_texture=float(os.environ.get("TEXTURE", 8)))
out, det_dir, poses_path = synth.write_kitti_sequence(seq, "/tmp/kitti_pteval")
gt = seq.T_wc[:N, :3, 3]

for label, kw in [
    ("two-phase (artifact config)", dict(pose_feedback=False)),
    ("tracked, no points", dict(pose_feedback=True)),
    ("tracked, points w=0.05", dict(pose_feedback=True, point_weight=0.05)),
    ("tracked, points w=0.1", dict(pose_feedback=True, point_weight=0.1)),
]:
    t0 = time.time()
    r = pipeline.run_kitti_slam(out, det_dir, poses_path,
                                max_objects=8, max_detections=4, window=16,
                                **kw)
    traj = np.asarray(r.traj_Twc_xyzq)[:N, :3]
    ate = ate_rmse(traj, gt)
    cubes = np.asarray(r.cubes_minimal); valid = np.asarray(r.cube_valid)
    gt_obj = np.stack([o.pos for o in seq.objects])
    errs = [float(np.linalg.norm(gt_obj - c[:3], axis=1).min()) for c in cubes[valid]]
    print(f"{label:30s} ATE {ate:7.3f} m  landmarks {int(valid.sum())} "
          f"errs {[round(e,2) for e in sorted(errs)]}  ({time.time()-t0:.0f}s)",
          flush=True)
