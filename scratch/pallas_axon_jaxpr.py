import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax._src import source_info_util
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

def f():
    return pf.hypothesis_block_fused(vp, c1x, geom, 1, 15.0, ang_a, ang_b, has, Kinv, Twc, plane, lane_valid)

jaxpr = jax.make_jaxpr(f)()

def walk(jx, depth=0):
    for eqn in jx.eqns:
        if eqn.primitive.name == "pallas_call":
            inner = eqn.params["jaxpr"]
            for e2 in inner.eqns:
                if e2.primitive.name == "device_put":
                    src = source_info_util.summarize(e2.source_info)
                    print("DEVICE_PUT in kernel:", e2, "AT", src)
        for v in eqn.params.values():
            if hasattr(v, "eqns"):
                walk(v, depth+1)
            if hasattr(v, "jaxpr") and hasattr(v.jaxpr, "eqns"):
                walk(v.jaxpr, depth+1)
walk(jaxpr.jaxpr)
print("done")
