import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from cube_slam_wu_tpu.ops.proposal import detect_cuboid_single, ProposalConfig
from cube_slam_wu_tpu.slam.pipeline import run_offline_slam
from cube_slam_wu_tpu.utils import io as uio
from cube_slam_wu_tpu.utils.metrics import ate_rmse

base = "/root/reference/detect_3d_cuboid/data/"
gray = jnp.asarray(uio.load_image_gray(base + "0000_rgb_raw.jpg"))
edges = uio.read_number_txt(base + "edge_detection/LSD/0000_edge.txt")
K = jnp.asarray([[529.5,0,365.],[0,529.5,265.],[0,0,1.]])
T = jnp.asarray([[1,0.0011,0.0004,0],[0,-0.3376,0.9413,0],[0.0011,-0.9413,-0.3376,1.35],[0,0,0,1.]])
L=320; lines=np.zeros((L,4)); lines[:len(edges)]=edges[:,:4]; msk=np.zeros(L,bool); msk[:len(edges)]=True
cfg = ProposalConfig(max_lines=L)
# flow 2: proposal on the real fixture
res = detect_cuboid_single(gray,K,T,jnp.asarray([187.,188.,201.,311.]),jnp.asarray(lines),jnp.asarray(msk),cfg)
res = jax.tree.map(np.asarray, res)
print("[proposal] valid:", res.valid, "pos:", np.round(res.pos,3), "scale:", np.round(res.scale,3),
      "rotY:", round(float(res.rotY),3), "cfg:", res.box_config_type)
# probe A: zero lines
r0 = jax.tree.map(np.asarray, detect_cuboid_single(gray,K,T,jnp.asarray([187.,188.,201.,311.]),
      jnp.asarray(lines), jnp.zeros(L,bool), cfg))
print("[probe zero-lines] valid:", r0.valid, "pos:", np.round(r0.pos,2), "angle_err:", round(float(r0.edge_angle_error),3),
      " (3*pi/3 =", round(np.pi,3), ")")
# probe B: degenerate tiny bbox (w=8 -> top-sample step <1 -> no proposals)
rt = jax.tree.map(np.asarray, detect_cuboid_single(gray,K,T,jnp.asarray([300.,300.,8.,8.]),
      jnp.asarray(lines), jnp.asarray(msk), cfg))
print("[probe tiny-bbox] valid:", rt.valid)
# flow 3: offline SLAM
t0=time.time(); out = run_offline_slam("/root/reference/object_slam/data/"); dt=time.time()-t0
truth = uio.read_number_txt("/root/reference/object_slam/data/truth_cam_poses.txt")
ref_out = uio.read_number_txt("/root/reference/object_slam/data/output_cam_poses.txt")
print(f"[slam] {dt:.0f}s  ATE ours={ate_rmse(out.traj_Twc_xyzq[:,:3], truth[:,1:4]):.4f} "
      f"ref={ate_rmse(ref_out[:,1:4], truth[:,1:4]):.4f}  "
      f"aligned ours={ate_rmse(out.traj_Twc_xyzq[:,:3], truth[:,1:4],align=True):.4f} "
      f"ref={ate_rmse(ref_out[:,1:4], truth[:,1:4],align=True):.4f}")
print("[slam] final cube:", np.round(out.cube_minimal,3))
