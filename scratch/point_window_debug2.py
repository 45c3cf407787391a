"""Debug v2: run the point step with ground hints, inspect internals."""
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
from cube_slam_wu_tpu.slam import tracker, point_ba
from cube_slam_wu_tpu.slam.graph import CameraObjectGraph
from cube_slam_wu_tpu.slam.window import CubePrior

rng = np.random.default_rng(3)
N, O, P, W = 40, 4, 64, 12
K = np.array([[240.0, 0, 160], [0, 240, 115], [0, 0, 1]])

def Twc_f(i):
    T = np.eye(4)
    T[:3, 0] = [1, 0, 0]; T[:3, 1] = [0, 0, -1]; T[:3, 2] = [0, 1, 0]
    T[:3, 3] = [0.02 * np.sin(i * 0.2), 0.08 * i, 1.65]
    return T

gt = np.stack([Twc_f(i) for i in range(N)])
cubes_gt = np.array([
    [-1.5, 4, 0.5, 0, 0, 0.3, 0.5, 0.4, 0.5],
    [1.6, 7, 0.4, 0, 0, 1.0, 0.6, 0.3, 0.4],
    [-1.8, 10, 0.5, 0, 0, -0.5, 0.4, 0.4, 0.5],
    [1.4, 13, 0.6, 0, 0, 0.2, 0.5, 0.5, 0.6],
])[:O]
meas9 = np.zeros((N, O, 9)); qual = np.zeros((N, O)); has = np.zeros((N, O), bool)
for i in range(N):
    T = SE3.from_rot_trans(jnp.asarray(gt[i][:3, :3]), jnp.asarray(gt[i][:3, 3]))
    for o in range(O):
        dy = cubes_gt[o, 1] - gt[i][1, 3]
        if 1.0 < dy < 6.0:
            cg = Cuboid.from_minimal(jnp.asarray(cubes_gt[o]))
            m = np.array(cg.transform_to(T).to_minimal())
            m[:3] += rng.normal(0, 0.08, 3); m[5] += rng.normal(0, 0.05)
            meas9[i, o] = m; qual[i, o] = 0.7; has[i, o] = True

pts_w = np.concatenate([
    np.column_stack([rng.uniform(-4, 4, P // 2), rng.uniform(1, 25, P // 2), np.zeros(P // 2)]),
    np.column_stack([rng.uniform(-2, 2, P - P // 2), rng.uniform(2, 16, P - P // 2), rng.uniform(0.2, 1.0, P - P // 2)]),
])
obs_uv = np.zeros((N, P, 2)); obs_mask = np.zeros((N, P), bool)
for i in range(N):
    Rcw = gt[i][:3, :3].T; tc = -Rcw @ gt[i][:3, 3]
    pc = pts_w @ Rcw.T + tc
    uv = pc @ K.T
    with np.errstate(all="ignore"):
        uv = uv[:, :2] / uv[:, 2:3]
    ok = (pc[:, 2] > 0.5) & (uv[:, 0] > 5) & (uv[:, 0] < 315) & (uv[:, 1] > 5) & (uv[:, 1] < 235)
    obs_uv[i] = np.where(ok[:, None], uv + rng.normal(0, 0.4, (P, 2)), 0)
    obs_mask[i] = ok

frames = tracker.FrameInput(
    meas=Cuboid.from_minimal(jnp.asarray(meas9)),
    quality=jnp.asarray(qual), has_meas=jnp.asarray(has),
    active=jnp.ones((N,), bool),
)
first = SE3.from_rot_trans(jnp.asarray(gt[0][:3, :3]), jnp.asarray(gt[0][:3, 3]))
graph = CameraObjectGraph.empty(N, O, jnp.float64)._replace(K=jnp.asarray(K))
prior = CubePrior.empty(O, jnp.float64)
ps = tracker.PointState.empty(N, P, jnp.float64)
step = tracker.make_windowed_point_step(
    W, jnp.asarray(K), 5, point_weight=0.1, reproj_gate_px=40.0,
)
ghint = np.zeros(P, bool); ghint[: P // 2] = True
carry = (graph, prior, ps)
for i in range(20):
    inp = (
        jnp.asarray(i), jax.tree.map(lambda a: a[i], frames), first,
        jnp.asarray(obs_uv[i]), jnp.asarray(obs_mask[i]),
        jnp.zeros((P,), bool), jnp.asarray(ghint),
    )
    carry, (chi2, _) = step(carry, inp)
    g, pr, ps2 = carry
    cam_y = float(g.cam_Twc().trans[i, 1])
    print(f"{i}: valid={int(ps2.point_valid.sum()):3d} cam_y={cam_y:+.3f} "
          f"(gt {0.08*i:+.3f}) chi2={float(chi2):.3f}")
print("points sample (slot 0-4):", np.asarray(ps2.points[:5]))
print("gt (slot 0-4):           ", pts_w[:5])

# --- replicate the window solve at the final frame and trace LM ------------
from cube_slam_wu_tpu.slam import window as win_mod
from cube_slam_wu_tpu.slam.point_ba import PointFactors
i = 19
s = int(np.clip(i - W + 1, 0, N - W))
win = win_mod.window_slice(g, jnp.asarray(s), W)
obs_uv_w = jnp.asarray(ps2.obs_uv[s:s+W])
obs_mask_w = jnp.asarray(ps2.obs_mask[s:s+W]) & win.frame_mask[:, None]
points = ps2.points; pvalid = ps2.point_valid
proj = jax.vmap(lambda T: jax.vmap(lambda X: point_ba.project_point(T, X, jnp.asarray(K)))(points))(win.cam_Tcw)
err = jnp.linalg.norm(proj - obs_uv_w, axis=-1)
obs_ok = obs_mask_w & pvalid[None, :] & (err < 40.0)
print("obs_ok count:", int(obs_ok.sum()), "median err of ok:", float(jnp.median(jnp.where(obs_ok, err, jnp.nan))))
factors = PointFactors(points=points, point_mask=pvalid, obs_uv=obs_uv_w,
                       obs_mask=obs_ok, obs_weight=jnp.full((W, P), 0.1))
for it in (1, 3, 8, 20):
    res = point_ba.optimize(win, factors, jnp.asarray(K), iterations=it,
                            fix_first=True, prior=pr, point_huber=2.0)
    print(f"iters={it}: chi2={float(res.chi2):.4f} lam={float(res.lambda_final):.2e} "
          f"cam_y_last={float(res.cam_Tcw.inverse().trans[-1,1]):+.4f}")

# --- where does the huge H diagonal come from? ------------------------------
from cube_slam_wu_tpu.slam.ba import _residual_vector
n_c = W * 6 + O * 9
zero_c = jnp.zeros((n_c,))
J_g = jax.jacfwd(lambda dx: _residual_vector(win, dx, True, None, pr))(zero_c)
H_g = J_g.T @ J_g
print("graph H maxdiag:", float(jnp.max(jnp.diag(H_g))))
# split: no prior
J_g2 = jax.jacfwd(lambda dx: _residual_vector(win, dx, True, None, None))(zero_c)
print("graph H maxdiag (no prior):", float(jnp.max(jnp.diag(J_g2.T @ J_g2))))
print("prior H maxdiag:", float(jnp.max(pr.H)))
print("prior valid:", np.asarray(pr.valid))

print("prior lin cube 0 minimal:", np.asarray(pr.lin.to_minimal()[0]))
print("cube est 0:", np.asarray(g.cube.to_minimal()[0]))
print("prior H[0] diag:", np.asarray(jnp.diag(pr.H[0])))
