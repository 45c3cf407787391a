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
Twc = SE3.from_xyzq(jnp.asarray(truth[:, 1:8]))
ref_obj = uio.read_number_txt(base + "output_obj_poses.txt")[-1]
gcube = Cuboid.from_minimal(jnp.asarray(ref_obj))
first = SE3.from_xyzq(jnp.asarray(truth[0,1:8]))

errs = np.full(len(has), np.inf)
for i in range(len(has)):
    if not has[i]: continue
    m = Cuboid.from_minimal(jnp.asarray(meas9[i]))
    errs[i] = np.linalg.norm(np.asarray(gcube.min_log_error(m.transform_from(Twc[i]))))

def run(h, q, label):
    fr = tracker.FrameInput(meas=Cuboid.from_minimal(jnp.asarray(meas9)),
        quality=jnp.asarray(q), has_meas=jnp.asarray(h), active=jnp.ones(len(q),bool))
    g, _ = tracker.run_incremental(first, fr)
    est = np.asarray(g.cam_Twc().to_xyzq())[:,:3]
    print(f"{label}: ATE {ate_rmse(est, truth[:,1:4]):.4f} aligned {ate_rmse(est, truth[:,1:4],align=True):.4f}")

run(has, quality, "all meas       ")
for k in (4, 8, 12, 16):
    order = np.argsort(-np.where(has, errs, -np.inf))
    h2 = has.copy(); h2[order[:k]] = False
    run(h2, quality, f"drop worst {k:2d}  ")
# soft: weight by 1/(1+err)
q2 = quality / (1.0 + 3.0*np.where(np.isfinite(errs), errs, 0))
run(has, q2, "soft downweight")
