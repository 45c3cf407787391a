import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from cube_slam_wu_tpu.ops.proposal import detect_cuboid_single, ProposalConfig
from cube_slam_wu_tpu.utils import io as uio
base = "/root/reference/detect_3d_cuboid/data/"
gray = jnp.asarray(uio.load_image_gray(base + "0000_rgb_raw.jpg"))
edges = uio.read_number_txt(base + "edge_detection/LSD/0000_edge.txt")
K = jnp.asarray([[529.5,0,365.],[0,529.5,265.],[0,0,1.]])
T = jnp.asarray([[1,0.0011,0.0004,0],[0,-0.3376,0.9413,0],[0.0011,-0.9413,-0.3376,1.35],[0,0,0,1.]])
bbox = jnp.asarray([187.,188.,201.,311.])
L=320; lines=np.zeros((L,4)); lines[:len(edges)]=edges[:,:4]; mask=np.zeros(L,bool); mask[:len(edges)]=True
cfg = ProposalConfig(max_lines=L)
t0=time.time(); res = detect_cuboid_single(gray,K,T,bbox,jnp.asarray(lines),jnp.asarray(mask),cfg); jax.block_until_ready(res); t1=time.time()
res2 = detect_cuboid_single(gray,K,T,bbox,jnp.asarray(lines),jnp.asarray(mask),cfg); jax.block_until_ready(res2); t2=time.time()
print(f"compile+run {t1-t0:.1f}s, steady-state {t2-t1:.3f}s")
