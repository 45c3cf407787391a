import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from cube_slam_wu_tpu.ops import proposal_fused as pf
from cube_slam_wu_tpu.ops.proposal import _BoxGeom

H = 256
key = jax.random.PRNGKey(0)
def rnd(k):
    return jax.random.normal(jax.random.fold_in(key, k), (H,), jnp.float32)

vp = {n: rnd(i) for i, n in enumerate(["a1","b1","w1","a2","b2","w2","a3","b3","w3"])}
c1x = rnd(20)
geom = _BoxGeom(*[jnp.float32(v) for v in [10., 20., 100., 120., 5., 15., 105., 125., 140.]])
ang_a = [rnd(30+i) for i in range(3)]
ang_b = [rnd(40+i) for i in range(3)]
has = [rnd(50+i) > 0 for i in range(3)]
Kinv = {f"{i}{j}": rnd(60+3*i+j) for i in range(3) for j in range(3)}
Twc = {f"{i}{j}": rnd(80+4*i+j) for i in range(3) for j in range(4)}
plane = tuple(rnd(95+i) for i in range(4))
lane_valid = jnp.ones((H,), bool)

out = pf.hypothesis_block_fused(vp, c1x, geom, 1, 15.0, ang_a, ang_b, has, Kinv, Twc, plane, lane_valid)
print("ok:", [np.asarray(o).shape for o in out[:2]])
