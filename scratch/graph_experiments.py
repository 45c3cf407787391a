import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from cube_slam_wu_tpu.slam import tracker
from cube_slam_wu_tpu.slam.pipeline import load_offline_dataset, build_offline_frames
from cube_slam_wu_tpu.core.se3 import SE3
from cube_slam_wu_tpu.core.cuboid import Cuboid
from cube_slam_wu_tpu.utils import io as uio
from cube_slam_wu_tpu.utils.metrics import ate_rmse

base = "/root/reference/object_slam/data/"
z = np.load("/root/repo/scratch/online_meas.npz")
meas9, quality, has = z["meas9"], z["quality"], z["has"]
truth = uio.read_number_txt(base + "truth_cam_poses.txt")
data = load_offline_dataset(base)
off = build_offline_frames(data)
off9 = np.asarray(off.meas.to_minimal()); offq = np.asarray(off.quality); offh = np.asarray(off.has_meas)
print("frames with meas: ours", has.sum(), "offline", offh.sum())
both = has & offh
d = np.linalg.norm(meas9[both,:3]-off9[both,:3],axis=1)
print("pos diff vs offline: med %.3f p90 %.3f max %.3f" % (np.median(d), np.percentile(d,90), d.max()))
dyaw = np.abs(((meas9[both,5]-off9[both,5]) + np.pi/4) % (np.pi/2) - np.pi/4)
print("yaw diff mod 90deg: med %.3f p90 %.3f max %.3f" % (np.median(dyaw), np.percentile(dyaw,90), dyaw.max()))
print("our yaw values spread:", np.round(meas9[has,5][:20],2))

first = SE3.from_xyzq(jnp.asarray(truth[0,1:8]))
def run(m9, q, h, label):
    fr = tracker.FrameInput(meas=Cuboid.from_minimal(jnp.asarray(m9)),
        quality=jnp.asarray(q), has_meas=jnp.asarray(h), active=jnp.ones(len(q),bool))
    g, _ = tracker.run_incremental(first, fr)
    est = np.asarray(g.cam_Twc().to_xyzq())[:,:3]
    print(f"{label}: ATE direct {ate_rmse(est, truth[:,1:4]):.4f} aligned {ate_rmse(est, truth[:,1:4],align=True):.4f}")

run(off9, offq, offh, "offline meas")
run(meas9, quality, has, "online meas")
# hybrid: our pos, offline yaw+scale
h9 = meas9.copy(); h9[both,3:] = off9[both,3:]
run(h9, quality, has, "our pos + offline rot/scale")
# hybrid2: offline pos, our yaw/scale
h2 = meas9.copy(); h2[both,:3] = off9[both,:3]
run(h2, quality, has, "offline pos + our rot/scale")
