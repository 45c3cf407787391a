import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from cube_slam_wu_tpu.ops.detect import detect_line_segments, DetectConfig
from cube_slam_wu_tpu.ops.proposal import detect_cuboid_single, ProposalConfig
from cube_slam_wu_tpu.core.se3 import SE3
from cube_slam_wu_tpu.core.cuboid import Cuboid
from cube_slam_wu_tpu.core import rotations as rotu
from cube_slam_wu_tpu.utils import io as uio

base = "/root/reference/object_slam/data/"
truth = uio.read_number_txt(base + "truth_cam_poses.txt")
T0se = SE3.from_xyzq(jnp.asarray(truth[0, 1:8]))
T0 = np.asarray(T0se.matrix())
roll0, pitch0, yaw0 = [float(v) for v in rotu.rot_to_euler_zyx(jnp.asarray(T0[:3,:3]))]
K = jnp.asarray([[535.4, 0, 320.1], [0, 539.2, 247.6], [0, 0, 1.0]])
dcfg = DetectConfig()
n = len(truth)
meas9 = np.zeros((n, 9)); quality = np.zeros(n); has = np.zeros(n, bool); errs = np.zeros(n)
for i in range(n):
    p = base + f"filter_2d_obj_txts/{i:04d}_yolo2_0.15.txt"
    if not os.path.exists(p): continue
    yolo = uio.read_number_txt(p)
    if yolo.size == 0: continue
    gray = jnp.asarray(uio.load_image_gray(base + f"raw_imgs/{i:04d}_rgb_raw.jpg"))
    lines, mask = detect_line_segments(gray, dcfg)
    cfg = ProposalConfig(max_lines=int(lines.shape[0]), sample_cam_roll_pitch=(i != 0), nominal_skew_ratio=2.0)
    bbox = jnp.asarray([yolo[0,0]-1, yolo[0,1]-1, yolo[0,2], yolo[0,3]])
    r = jax.tree.map(np.asarray, detect_cuboid_single(gray, K, jnp.asarray(T0), bbox, lines, mask, cfg))
    if not bool(r.valid): continue
    cube_ground = Cuboid.from_minimal(jnp.asarray([*r.pos, 0., 0., float(r.rotY), *r.scale]))
    Rn = rotu.euler_zyx_to_rot(jnp.asarray(roll0 + float(r.camera_roll_delta)),
                               jnp.asarray(pitch0 + float(r.camera_pitch_delta)), jnp.asarray(yaw0))
    pose_used = SE3.from_rot_trans(Rn, jnp.asarray(T0[:3,3]))
    meas9[i] = np.asarray(cube_ground.transform_to(pose_used).to_minimal())
    errs[i] = float(r.normalized_error)
    quality[i] = (1.0 - errs[i] + 0.5)/2.0
    has[i] = True
np.savez("/root/repo/scratch/online_meas.npz", meas9=meas9, quality=quality, has=has, errs=errs)
print("saved", has.sum(), "measurements")
