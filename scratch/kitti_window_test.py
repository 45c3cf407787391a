"""Is the fixed-lag window what freezes bad far-seeded landmarks?
window=None (full-graph) at 300 frames is computationally infeasible on
CPU (killed after 40+ min: jacfwd over a 1800-dim increment inside a
300-step scan) -- which is the reason the windowed mode exists.  Test
wider windows instead."""
import os, sys, time
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
                          seed=4)
gt = seq.T_wc[:N, :3, 3]
gt_obj = np.stack([o.pos for o in seq.objects])
out = "/tmp/kitti_long"
for w in (48, 32):
    t0 = time.time()
    r = pipeline.run_kitti_slam(out, out + "/detections", out + "/poses.txt",
                                max_objects=8, max_detections=4, window=w)
    traj = np.asarray(r.traj_Twc_xyzq)
    ate = ate_rmse(traj[:N, :3], gt)
    err = np.linalg.norm(traj[:N, :3] - gt, axis=1)
    cubes = np.asarray(r.cubes_minimal)[np.asarray(r.cube_valid)]
    errs = [round(float(np.linalg.norm(gt_obj - c[:3], axis=1).min()), 2)
            for c in cubes]
    print(f"window={w}: ATE {ate:.3f} tail(250+) {err[250:].mean():.2f} "
          f"landmarks {len(cubes)} errs {errs} ({time.time()-t0:.0f}s)",
          flush=True)
