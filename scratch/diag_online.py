import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from cube_slam_wu_tpu.ops.detect import detect_line_segments, DetectConfig
from cube_slam_wu_tpu.ops.proposal import detect_cuboid_single, ProposalConfig
from cube_slam_wu_tpu.core.se3 import SE3
from cube_slam_wu_tpu.core.cuboid import Cuboid
from cube_slam_wu_tpu.utils import io as uio

base = "/root/reference/object_slam/data/"
truth = uio.read_number_txt(base + "truth_cam_poses.txt")
T0 = SE3.from_xyzq(jnp.asarray(truth[0, 1:8])).matrix()
K = jnp.asarray([[535.4, 0, 320.1], [0, 539.2, 247.6], [0, 0, 1.0]])
dcfg = DetectConfig()

print("frame: world-frame cuboid from detection [x y z yaw l w h] err q")
for i in range(0, 58, 4):
    yolo = uio.read_number_txt(base + f"filter_2d_obj_txts/{i:04d}_yolo2_0.15.txt")
    gray = jnp.asarray(uio.load_image_gray(base + f"raw_imgs/{i:04d}_rgb_raw.jpg"))
    lines, mask = detect_line_segments(gray, dcfg)
    cfg = ProposalConfig(max_lines=int(lines.shape[0]), sample_cam_roll_pitch=(i != 0), nominal_skew_ratio=2.0)
    bbox = jnp.asarray([yolo[0,0]-1, yolo[0,1]-1, yolo[0,2], yolo[0,3]])
    r = jax.tree.map(np.asarray, detect_cuboid_single(gray, K, jnp.asarray(T0), bbox, lines, mask, cfg))
    print(f"{i:3d}: {r.pos[0]:7.3f} {r.pos[1]:6.3f} {r.pos[2]:6.3f}  yaw {float(r.rotY):6.2f} "
          f"scale {r.scale[0]:.3f} {r.scale[1]:.3f} {r.scale[2]:.3f}  err {float(r.normalized_error):.3f} "
          f"rp_delta {float(r.camera_roll_delta):+.3f}/{float(r.camera_pitch_delta):+.3f} valid {bool(r.valid)}")
