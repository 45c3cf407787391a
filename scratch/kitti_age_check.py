import os, sys
import jax
os.environ["JAX_PLATFORMS"] = "cpu"
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, "/root/repo")
import numpy as np
from cube_slam_wu_tpu.utils import synth
from cube_slam_wu_tpu.slam import pipeline
from cube_slam_wu_tpu.utils.metrics import ate_rmse

seq = synth.make_sequence(n_frames=100, n_objects=6, size=(240, 320),
                          speed=0.5, curve=0.002, noise_px=0.8,
                          dropout=0.05, seed=4)
out, det_dir, poses_path = synth.write_kitti_sequence(seq, "/tmp/kage")
for age in (12, None):
    r = pipeline.run_kitti_slam(out, det_dir, poses_path, max_objects=12,
                                max_detections=4, window=16, track_max_age=age)
    traj = np.asarray(r.traj_Twc_xyzq)
    ate = ate_rmse(traj[:100, :3], seq.T_wc[:100, :3, 3])
    cubes = np.asarray(r.cubes_minimal)[np.asarray(r.cube_valid)]
    gt_obj = np.stack([o.pos for o in seq.objects])
    errs = [float(np.linalg.norm(gt_obj - c[:3], axis=1).min()) for c in cubes]
    print(f"age={age}: ATE {ate:.3f} landmarks {len(cubes)} "
          f"errs {[round(e,2) for e in errs]}", flush=True)
