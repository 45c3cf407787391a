import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from cube_slam_wu_tpu.slam.pipeline import load_offline_dataset, build_offline_frames
from cube_slam_wu_tpu.core.se3 import SE3
from cube_slam_wu_tpu.core.cuboid import Cuboid
from cube_slam_wu_tpu.utils import io as uio

base = "/root/reference/object_slam/data/"
z = np.load("/root/repo/scratch/online_meas.npz")
meas9, has = z["meas9"], z["has"]
data = load_offline_dataset(base)
off = build_offline_frames(data)
off9 = np.asarray(off.meas.to_minimal()); offh = np.asarray(off.has_meas)
truth = uio.read_number_txt(base + "truth_cam_poses.txt")
Twc = SE3.from_xyzq(jnp.asarray(truth[:, 1:8]))  # truth poses per frame

# good global cuboid: reference committed final object pose
ref_obj = uio.read_number_txt(base + "output_obj_poses.txt")[-1]
gcube = Cuboid.from_minimal(jnp.asarray(ref_obj))

def residuals(m9, h, label):
    norms = []
    rots = []
    for i in range(len(h)):
        if not h[i]: continue
        m = Cuboid.from_minimal(jnp.asarray(m9[i]))
        est_global = m.transform_from(Twc[i])   # using TRUTH pose: pure measurement error
        e = np.asarray(gcube.min_log_error(est_global))
        norms.append(np.linalg.norm(e)); rots.append(np.linalg.norm(e[:3]))
    norms, rots = np.array(norms), np.array(rots)
    print(f"{label}: |err9| med {np.median(norms):.3f} p90 {np.percentile(norms,90):.3f} max {norms.max():.3f} | "
          f"|rot| med {np.median(rots):.3f} p90 {np.percentile(rots,90):.3f} max {rots.max():.3f}")

residuals(off9, offh, "offline")
residuals(meas9, has, "online ")
