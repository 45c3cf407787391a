import time, numpy as np, jax, jax.numpy as jnp
print(jax.devices())
x = jnp.ones((2000, 2000), jnp.float32)
@jax.jit
def f(x):
    for _ in range(10):
        x = x @ x * 1e-3
    return x
jax.block_until_ready(f(x))
t0=time.perf_counter()
for _ in range(10): out = f(x)
jax.block_until_ready(out)
print("block_until_ready timing per call:", (time.perf_counter()-t0)/10*1e3, "ms")
t0=time.perf_counter()
for _ in range(10): out = np.asarray(f(x))
print("device_get timing per call:", (time.perf_counter()-t0)/10*1e3, "ms")
# theoretical: 10 matmuls of 2000^3*2 = 160 GFLOP / call
