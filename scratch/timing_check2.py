import time, numpy as np, jax, jax.numpy as jnp
x = jnp.ones((2000, 2000), jnp.float32)
@jax.jit
def big(x):
    for _ in range(10):
        x = x @ x * 1e-3
    return x.sum()
@jax.jit
def tiny(x):
    return x[0,0] * 2
np.asarray(big(x)); np.asarray(tiny(x))
for name, f, reps in [("tiny", tiny, 20), ("big(10 matmul 2000^3)", big, 10)]:
    t0=time.perf_counter()
    for _ in range(reps): r = np.asarray(f(x))
    dt=(time.perf_counter()-t0)/reps*1e3
    print(f"{name}: {dt:.2f} ms/call (scalar fetch)")
