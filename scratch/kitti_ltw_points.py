"""line_track_weight x point_weight interaction on the 120-frame interleaved
drive: does line tracking still earn ATE on top of the production joint
point-BA config?"""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from cube_slam_wu_tpu.utils import synth
from cube_slam_wu_tpu.slam import pipeline
from cube_slam_wu_tpu.utils.metrics import ate_rmse

N = 120
seq = synth.make_sequence(n_frames=N, n_objects=6, size=(240, 320),
                          speed=0.5, curve=0.002, noise_px=0.8, dropout=0.05,
                          seed=4, ground_texture=4.0)
out, det_dir, poses_path = synth.write_kitti_sequence(seq, "/tmp/kitti_ltw")
gt = seq.T_wc[:N, :3, 3]
gt_obj = np.stack([o.pos for o in seq.objects])
for w in (0.0, 0.3, 0.5):
    t0 = time.time()
    r = pipeline.run_kitti_slam(out, det_dir, poses_path,
                                max_objects=8, max_detections=4, window=16,
                                pose_feedback=True, point_weight=0.3,
                                line_track_weight=w)
    traj = np.asarray(r.traj_Twc_xyzq)
    ate = ate_rmse(traj[:N, :3], gt)
    cubes = np.asarray(r.cubes_minimal)[np.asarray(r.cube_valid)]
    errs = sorted(round(float(np.linalg.norm(gt_obj - c[:3], axis=1).min()), 2)
                  for c in cubes)
    print(f"RESULT points+line_track_weight={w}: ATE {ate:.4f} m, "
          f"landmarks {len(cubes)} errs {errs} ({time.time()-t0:.0f}s)",
          flush=True)
