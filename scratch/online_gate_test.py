import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from cube_slam_wu_tpu.slam import tracker
from cube_slam_wu_tpu.core.se3 import SE3
from cube_slam_wu_tpu.core.cuboid import Cuboid
from cube_slam_wu_tpu.utils import io as uio
from cube_slam_wu_tpu.utils.metrics import ate_rmse

base = "/root/reference/object_slam/data/"
z = np.load("/root/repo/scratch/online_meas.npz")
meas9, quality, has = z["meas9"], z["quality"], z["has"]
truth = uio.read_number_txt(base + "truth_cam_poses.txt")
first = SE3.from_xyzq(jnp.asarray(truth[0,1:8]))
fr = tracker.FrameInput(meas=Cuboid.from_minimal(jnp.asarray(meas9)),
    quality=jnp.asarray(quality), has_meas=jnp.asarray(has), active=jnp.ones(len(quality),bool))

def run(label, **kw):
    g, _ = tracker.run_incremental(first, fr, **kw)
    est = np.asarray(g.cam_Twc().to_xyzq())[:,:3]
    print(f"{label}: ATE {ate_rmse(est, truth[:,1:4]):.4f} aligned {ate_rmse(est, truth[:,1:4],align=True):.4f}")

run("no gate        ")
run("hard gate 0.45 ", gate_threshold=0.45)
run("hard gate 0.35 ", gate_threshold=0.35)
run("soft alpha 3   ", soft_gate_alpha=3.0)
run("soft 3 + g 0.5 ", soft_gate_alpha=3.0, gate_threshold=0.5)
run("soft 5 + g 0.4 ", soft_gate_alpha=5.0, gate_threshold=0.4)
