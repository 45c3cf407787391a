"""Bisect the 300-frame divergence: length, dropout, window, gating."""
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

def run(n, objs, dropout, seed=4, **kw):
    seq = synth.make_sequence(n_frames=n, n_objects=objs, size=(240, 320),
                              speed=0.5, curve=0.002, noise_px=0.8,
                              dropout=dropout, seed=seed)
    out, det_dir, poses_path = synth.write_kitti_sequence(seq, f"/tmp/kd_{n}_{objs}_{dropout}_{seed}")
    r = pipeline.run_kitti_slam(out, det_dir, poses_path,
                                max_objects=8, max_detections=4, **kw)
    traj = np.asarray(r.traj_Twc_xyzq)
    ate = ate_rmse(traj[:n, :3], seq.T_wc[:n, :3, 3])
    print(f"n={n} objs={objs} drop={dropout} kw={kw}: ATE {ate:.3f} "
          f"valid={int(np.asarray(r.cube_valid).sum())} "
          f"rep=({r.frontend_report.summary()})", flush=True)

run(100, 6, 0.05, window=16)
run(100, 6, 0.0, window=16)
run(100, 6, 0.05, window=None)
run(100, 6, 0.05, window=16, soft_gate_alpha=1.0)
