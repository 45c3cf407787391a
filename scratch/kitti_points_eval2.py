"""Matrix: ground texture x point weight on the tracked KITTI loop."""
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

N = 120
for tex in (0.0, 4.0):
    seq = synth.make_sequence(n_frames=N, n_objects=6, size=(240, 320),
                              speed=0.5, curve=0.002, noise_px=0.8,
                              dropout=0.05, seed=4, ground_texture=tex)
    out, det_dir, poses_path = synth.write_kitti_sequence(
        seq, f"/tmp/kitti_pteval_t{int(tex)}")
    gt = seq.T_wc[:N, :3, 3]
    for pw in (0.1, 0.3):
        t0 = time.time()
        r = pipeline.run_kitti_slam(out, det_dir, poses_path,
                                    max_objects=8, max_detections=4,
                                    window=16, pose_feedback=True,
                                    point_weight=pw)
        traj = np.asarray(r.traj_Twc_xyzq)[:N, :3]
        ate = ate_rmse(traj, gt)
        valid = np.asarray(r.cube_valid)
        gt_obj = np.stack([o.pos for o in seq.objects])
        errs = sorted(float(np.linalg.norm(gt_obj - c[:3], axis=1).min())
                      for c in np.asarray(r.cubes_minimal)[valid])
        print(f"tex={tex} w={pw}: ATE {ate:6.3f} m  lm {int(valid.sum())} "
              f"errs {[round(e,2) for e in errs]} ({time.time()-t0:.0f}s)",
              flush=True)
