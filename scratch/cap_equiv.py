import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import dataclasses
import jax.numpy as jnp
import numpy as np
from cube_slam_wu_tpu.ops.proposal import ProposalConfig, detect_cuboid_single
from cube_slam_wu_tpu.ops.detect import DetectConfig, detect_line_segments
from cube_slam_wu_tpu.utils import io as uio
from cube_slam_wu_tpu.core.se3 import SE3

tum = "/root/reference/object_slam/data/"
K2 = jnp.asarray([[535.4,0,320.1],[0,539.2,247.6],[0,0,1.0]])
truth = uio.read_number_txt(tum + "truth_cam_poses.txt")
first = SE3.from_xyzq(jnp.asarray(truth[0,1:8])).matrix()
dcfg = DetectConfig()
for fi in [5, 30, 57]:
    g = jnp.asarray(uio.load_image_gray(tum + f"raw_imgs/{fi:04d}_rgb_raw.jpg"))
    det = uio.read_number_txt(tum + f"filter_2d_obj_txts/{fi:04d}_yolo2_0.15.txt").reshape(-1, 5)
    ls, lm = detect_line_segments(g.astype(jnp.float32), dcfg)
    base = ProposalConfig(max_lines=int(ls.shape[0]), sample_cam_roll_pitch=True)
    cap_on = dataclasses.replace(base, dist_gather_cap=6144)
    cap_off = dataclasses.replace(base, dist_gather_cap=0)
    bb = jnp.asarray(det[0, :4], jnp.float64)
    r1 = detect_cuboid_single(g, K2, first, bb, ls.astype(jnp.float64), lm, cap_on)
    r0 = detect_cuboid_single(g, K2, first, bb, ls.astype(jnp.float64), lm, cap_off)
    assert bool(r1.valid) == bool(r0.valid)
    np.testing.assert_array_equal(np.asarray(r1.pos), np.asarray(r0.pos))
    np.testing.assert_array_equal(np.asarray(r1.rotY), np.asarray(r0.rotY))
    np.testing.assert_array_equal(np.asarray(r1.scale), np.asarray(r0.scale))
    np.testing.assert_array_equal(np.asarray(r1.normalized_error), np.asarray(r0.normalized_error))
    print(f"frame {fi}: cap == no-cap (bitwise) OK")
print("EQUIV OK")
