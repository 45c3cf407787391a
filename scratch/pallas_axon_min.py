import sys
sys.path.insert(0, "/root/repo")
import numpy as np, math
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kern(x_ref, o_ref):
    x = x_ref[0]
    y = jnp.where(x > math.pi/2, x - math.pi, x)
    z = jnp.full_like(y, 3.0)
    o_ref[0] = y + z + jnp.zeros_like(y)

x = jnp.ones((1, 8, 128), jnp.float32)
out = pl.pallas_call(
    kern,
    out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x)
print("minimal ok:", np.asarray(out).sum())
