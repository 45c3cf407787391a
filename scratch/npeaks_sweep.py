"""Does reducing n_peaks (the dominant detector gather axis) cost recall
or online ATE?"""
import os, sys
import jax
os.environ["JAX_PLATFORMS"] = "cpu"
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp
from cube_slam_wu_tpu.ops.detect import DetectConfig, detect_line_segments
from cube_slam_wu_tpu.utils import io as uio
sys.path.insert(0, "/root/repo/tests")
from test_detect import _match

gray = np.asarray(uio.load_image_gray("/root/reference/detect_3d_cuboid/data/0000_rgb_raw.jpg"))
ref = uio.read_number_txt("/root/reference/detect_3d_cuboid/data/edge_detection/LSD/0000_edge.txt")
ref_long = ref[np.hypot(ref[:,2]-ref[:,0], ref[:,3]-ref[:,1]) > 40]
for P in (384, 320, 256, 192):
    cfg = DetectConfig(n_peaks=P)
    l, m = detect_line_segments(jnp.asarray(gray, jnp.float32), cfg)
    det = np.asarray(l)[np.asarray(m)]
    r = sum(any(_match(d, rr) for d in det) for rr in ref_long)/len(ref_long)
    print(f"n_peaks={P}: recall {r:.3f} lines {len(det)}")
