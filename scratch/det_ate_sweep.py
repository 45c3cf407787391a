"""Full 58-frame online ATE for a detector-config variation.

Usage: python scratch/det_ate_sweep.py key=val [key=val...]
"""
import os, sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import dataclasses
import numpy as np

from cube_slam_wu_tpu.ops.detect import DetectConfig
from cube_slam_wu_tpu.slam.pipeline import run_online_slam
from cube_slam_wu_tpu.utils import io as uio
from cube_slam_wu_tpu.utils.metrics import ate_rmse

overrides = {}
for kv in sys.argv[1:]:
    k, v = kv.split("=")
    f = dataclasses.fields(DetectConfig)
    typ = {x.name: x.type for x in f}[k]
    overrides[k] = int(v) if typ == "int" else float(v)

cfg = dataclasses.replace(DetectConfig(), **overrides)
BASE = "/root/reference/object_slam/data/"
truth = uio.read_number_txt(BASE + "truth_cam_poses.txt")
result = run_online_slam(BASE, detect_cfg=cfg)
est = result.traj_Twc_xyzq[:, :3]
ate = ate_rmse(est, truth[:, 1:4])
atea = ate_rmse(est, truth[:, 1:4], align=True)
print(f"RESULT {sys.argv[1:]} ate={ate:.4f} aligned={atea:.4f}", flush=True)
