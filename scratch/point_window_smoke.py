"""Smoke/eval: does the point-augmented windowed step reduce trajectory
drift on a synthetic drive?  Ground-truth world, noisy cuboid measurements,
noisy point-track observations."""
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
from cube_slam_wu_tpu.utils.metrics import ate_rmse

rng = np.random.default_rng(3)
N, O, P, W = 120, 4, 64, 12
K = np.array([[240.0, 0, 160], [0, 240, 115], [0, 0, 1]])

# camera drives forward along +y (z-up world), camera x right / y down / z fwd
def Twc(i):
    T = np.eye(4)
    T[:3, 0] = [1, 0, 0]
    T[:3, 1] = [0, 0, -1]
    T[:3, 2] = [0, 1, 0]
    T[:3, 3] = [0.02 * np.sin(i * 0.2), 0.08 * i, 1.65]
    return T

gt = np.stack([Twc(i) for i in range(N)])
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
            m[:3] += rng.normal(0, 0.08, 3)  # noisy monocular lift
            m[5] += rng.normal(0, 0.05)
            meas9[i, o] = m; qual[i, o] = 0.7; has[i, o] = True

# world points: scattered on ground + on boxes ahead of the camera
pts_w = np.concatenate([
    np.column_stack([rng.uniform(-4, 4, P // 2), rng.uniform(1, 25, P // 2),
                     np.zeros(P // 2)]),
    np.column_stack([rng.uniform(-2, 2, P - P // 2), rng.uniform(2, 16, P - P // 2),
                     rng.uniform(0.2, 1.0, P - P // 2)]),
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
    quality=jnp.asarray(qual),
    has_meas=jnp.asarray(has),
    active=jnp.ones((N,), bool),
)
first = SE3.from_rot_trans(jnp.asarray(gt[0][:3, :3]), jnp.asarray(gt[0][:3, 3]))

g0, _, _ = tracker.run_incremental(first, frames, window=W)
ate0 = ate_rmse(np.asarray(g0.cam_Twc().to_xyzq())[:, :3], gt[:, :3, 3])
print(f"windowed, no points : ATE {ate0:.4f} m")

ground_hint = np.zeros((N, P), bool)
ground_hint[:, : P // 2] = True  # the true ground points

for pw in (0.1, 0.3, 1.0, 2.0):
    for gh in (True,):
        po = (obs_uv, obs_mask, ground_hint) if gh else (obs_uv, obs_mask)
        g1, _, _ = tracker.run_incremental(
            first, frames, window=W, K=jnp.asarray(K),
            point_obs=po, point_weight=pw,
            point_opts=dict(reproj_gate_px=40.0),
        )
        ate1 = ate_rmse(np.asarray(g1.cam_Twc().to_xyzq())[:, :3], gt[:, :3, 3])
        print(f"windowed, points w={pw} ground_hint={gh}: ATE {ate1:.4f} m")
