"""Where does the 300-frame ATE 3.64 come from?  Per-frame error profile of
the committed artifact trajectory + which tracks measured at what ranges."""
import os, sys
import numpy as np

traj = np.loadtxt("/root/repo/artifacts/kitti_synth_300/output_cam_poses.txt")
sys.path.insert(0, "/root/repo")
import jax
os.environ["JAX_PLATFORMS"] = "cpu"
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from cube_slam_wu_tpu.utils import synth

seq = synth.make_sequence(n_frames=300, n_objects=6, size=(240, 320),
                          speed=0.5, curve=0.002, noise_px=0.8, dropout=0.05,
                          seed=4)
gt = seq.T_wc[:300, :3, 3]
est = traj[:, 1:4]
err = np.linalg.norm(est - gt, axis=1)
for a in range(0, 300, 25):
    b = min(a + 25, 300)
    print(f"frames {a:3d}-{b:3d}: mean err {err[a:b].mean():6.2f} "
          f"max {err[a:b].max():6.2f}")
print("gt objects y:", [round(float(o.pos[1]), 1) for o in seq.objects])
