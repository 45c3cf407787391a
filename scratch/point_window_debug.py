"""Debug the point-window step: run it manually and inspect point state."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp
from cube_slam_wu_tpu.core.cuboid import Cuboid
from cube_slam_wu_tpu.core.se3 import SE3
from cube_slam_wu_tpu.slam import tracker
from cube_slam_wu_tpu.slam.graph import CameraObjectGraph
from cube_slam_wu_tpu.slam.window import CubePrior

exec(open("/root/repo/scratch/point_window_smoke.py").read().split("frames = tracker.FrameInput")[0].split("import jax\n")[-1].replace('jax.config.update("jax_platforms", "cpu")', "").replace('jax.config.update("jax_enable_x64", True)', ""))

frames = tracker.FrameInput(
    meas=Cuboid.from_minimal(jnp.asarray(meas9)),
    quality=jnp.asarray(qual),
    has_meas=jnp.asarray(has),
    active=jnp.ones((N,), bool),
)
first = SE3.from_rot_trans(jnp.asarray(gt[0][:3, :3]), jnp.asarray(gt[0][:3, 3]))

graph = CameraObjectGraph.empty(N, O, jnp.float64)._replace(K=jnp.asarray(K))
prior = CubePrior.empty(O, jnp.float64)
ps = tracker.PointState.empty(N, P, jnp.float64)
step = tracker.make_windowed_point_step(W, jnp.asarray(K), 5, point_weight=0.05)

first_b = first
carry = (graph, prior, ps)
for i in range(25):
    inp = (
        jnp.asarray(i), jax.tree.map(lambda a: a[i], frames), first_b,
        jnp.asarray(obs_uv[i]), jnp.asarray(obs_mask[i]),
        jnp.zeros((P,), bool),
    )
    carry, (chi2, _) = step(carry, inp)
    g, pr, ps2 = carry
    print(i, "valid pts:", int(ps2.point_valid.sum()),
          "obs row:", int(ps2.obs_mask[i].sum()),
          "chi2:", float(chi2))
    ps = ps2

# --- probe the acceptance chain at the final carry state -------------------
from cube_slam_wu_tpu.slam import point_ba
from cube_slam_wu_tpu.slam import window as win_mod
g, pr, ps2 = carry
i = 24
s = int(np.clip(i - W + 1, 0, N - W))
win = win_mod.window_slice(g, jnp.asarray(s), W)
obs_uv_w = jnp.asarray(ps2.obs_uv[s:s+W])
obs_mask_w = jnp.asarray(ps2.obs_mask[s:s+W]) & win.frame_mask[:, None]
n_obs = jnp.sum(obs_mask_w, axis=0)
print("n_obs>=3:", int((n_obs >= 3).sum()))
X_new, tri_ok = point_ba.triangulate_points(win.cam_Tcw, obs_uv_w, obs_mask_w, jnp.asarray(K))
print("tri_ok:", int(tri_ok.sum()))
proj = jax.vmap(lambda T: jax.vmap(lambda X: point_ba.project_point(T, X, jnp.asarray(K)))(X_new))(win.cam_Tcw)
err = jnp.linalg.norm(proj - obs_uv_w, axis=-1)
err_m = jnp.where(obs_mask_w, err, 0.0)
print("max err per pt (first 10):", np.asarray(jnp.max(err_m, axis=0))[:10])
print("all<8:", int(jnp.all(err_m < 8.0, axis=0).sum()))
rng_new = jnp.linalg.norm(X_new - win.cam_Tcw[-1].inverse().trans[None, :], axis=-1)
print("rng<60:", int((rng_new < 60).sum()))
print("X_new sample:", np.asarray(X_new[:3]), "gt:", pts_w[:3])

print("win cam centers:", np.asarray(win.cam_Twc().trans))
# triangulate with GROUND-TRUTH poses to isolate the solver
Ts = []
for f in range(s, s+W):
    Rcw = gt[f][:3, :3].T; tc = -Rcw @ gt[f][:3, 3]
    Ts.append((Rcw, tc))
quats = jnp.stack([SE3.from_rot_trans(jnp.asarray(R_), jnp.asarray(t_)).quat for R_, t_ in Ts])
trans = jnp.stack([jnp.asarray(t_) for _, t_ in Ts])
gt_Tcw = SE3(quats, trans)
Xg, okg = point_ba.triangulate_points(gt_Tcw, obs_uv_w, obs_mask_w, jnp.asarray(K))
print("gt-pose tri_ok:", int(okg.sum()))
print("gt-pose X sample:", np.asarray(Xg[1:4]), "gt:", pts_w[1:4])
