import os, sys, pathlib
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from cube_slam_wu_tpu.slam import tracker, features, point_ba
from cube_slam_wu_tpu.core.se3 import SE3
from cube_slam_wu_tpu.core.cuboid import Cuboid
from cube_slam_wu_tpu.utils import io as uio

base = pathlib.Path("/root/reference/object_slam/data/")
z = np.load("/root/repo/scratch/online_meas.npz")
meas9, quality, has = z["meas9"], z["quality"], z["has"]
truth = uio.read_number_txt(base / "truth_cam_poses.txt")
first = SE3.from_xyzq(jnp.asarray(truth[0,1:8]))
fr = tracker.FrameInput(meas=Cuboid.from_minimal(jnp.asarray(meas9[:, None, :])),
    quality=jnp.asarray(quality[:, None]), has_meas=jnp.asarray(has[:, None]),
    active=jnp.ones(len(quality), bool))
graph, _ = tracker.run_incremental(first, fr, soft_gate_alpha=2.0)
n = len(quality)
grays = [jnp.asarray(uio.load_image_gray(base / "raw_imgs" / f"{i:04d}_rgb_raw.jpg")) for i in range(n)]
obs_uv, obs_mask = features.build_point_tracks(grays, max_corners=192)
print("track survival per frame:", obs_mask.sum(axis=1)[:10], "...", obs_mask.sum(axis=1)[-3:])
K = jnp.asarray([[535.4, 0, 320.1], [0, 539.2, 247.6], [0, 0, 1.0]])
pts, ok = point_ba.triangulate_points(graph.cam_Tcw, jnp.asarray(obs_uv), jnp.asarray(obs_mask), K)
print("triangulated ok:", int(np.asarray(ok).sum()), "/", 192)
proj = jax.vmap(lambda T: jax.vmap(lambda X: point_ba.project_point(T, X, K))(pts))(graph.cam_Tcw)
err = np.asarray(jnp.linalg.norm(proj - jnp.asarray(obs_uv), axis=-1))
m = np.asarray(obs_mask) & np.asarray(ok)[None, :]
print("reproj err over valid obs: med %.1f p90 %.1f" % (np.median(err[m]), np.percentile(err[m], 90)))
print("n obs with err<8px:", int((m & (err < 8)).sum()), "of", int(m.sum()))
