"""Count compiled-HLO ops for detect_cuboid_single on TPU (why 21 ms?)."""
import os, sys, collections, re

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from cube_slam_wu_tpu.ops.proposal import ProposalConfig, detect_cuboid_single
from cube_slam_wu_tpu.utils import io as uio

base = "/root/reference/detect_3d_cuboid/data/"
gray = jnp.asarray(uio.load_image_gray(base + "0000_rgb_raw.jpg"), jnp.float32)
K = jnp.asarray([[529.5, 0, 365.0], [0, 529.5, 265.0], [0, 0, 1]], jnp.float32)
T = jnp.asarray(
    [[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 1.65], [0, 0, 0, 1]], jnp.float32
)
bbox = jnp.asarray([188.0, 189.0, 201.0, 311.0], jnp.float32)
edges = np.loadtxt(base + "edge_detection/LSD/0000_edge.txt")
L = 128
lines = np.zeros((L, 4), np.float32)
lines[: len(edges)] = edges[:L]
mask = np.zeros(L, bool)
mask[: len(edges)] = True

cfg = ProposalConfig(max_lines=L, sample_cam_roll_pitch=True)
lowered = jax.jit(
    lambda *a: detect_cuboid_single(*a, cfg=cfg)
).lower(gray, K, T, bbox, jnp.asarray(lines), jnp.asarray(mask))
comp = lowered.compile()
hlo = comp.as_text()
# count top-level instructions in entry computation and fusion count
ops = collections.Counter()
for m in re.finditer(r"^\s+\S+ = (\w+)", hlo, re.M):
    ops[m.group(1)] += 1
print("total instrs:", sum(ops.values()))
for k, v in ops.most_common(25):
    print(f"  {k:30s} {v}")
# fusions in entry only
entry = hlo.split("ENTRY")[1] if "ENTRY" in hlo else hlo
eops = collections.Counter(m.group(1) for m in re.finditer(r"^\s+\S+ = (\w+)", entry, re.M))
print("ENTRY instrs:", sum(eops.values()))
for k, v in eops.most_common(25):
    print(f"  {k:30s} {v}")
