import time, numpy as np, jax, jax.numpy as jnp
dtype = jnp.float32
dm = jnp.asarray(np.random.default_rng(1).random((480, 640)), dtype)
yi0 = jnp.asarray(np.random.default_rng(2).integers(0, 400, size=(9, 11, 38400)), jnp.int32)
xi0 = jnp.asarray(np.random.default_rng(3).integers(0, 600, size=(9, 11, 38400)), jnp.int32)

def timed(name, fn, n_lo=4, n_hi=32):
    def make(n):
        @jax.jit
        def run():
            def body(c, _):
                return fn(c), None
            out, _ = jax.lax.scan(body, jnp.asarray(0.0, dtype), None, length=n)
            return out
        return run
    f_lo, f_hi = make(n_lo), make(n_hi)
    float(np.asarray(f_lo())); float(np.asarray(f_hi()))
    def best2(f, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(np.asarray(f())); ts.append(time.perf_counter()-t0)
        return min(ts)
    dt = max((best2(f_hi) - best2(f_lo)) / (n_hi - n_lo), 0)
    print(f"{name:<38} {dt*1e3:8.3f} ms", flush=True)

def gather_dep(c):
    # indices depend on carry -> cannot be hoisted
    sh = (c * 0).astype(jnp.int32)
    return jnp.sum(dm[yi0 + sh, xi0 + sh])
timed("gather 3.8M (carry-dependent idx)", gather_dep)

def gather_1d(c):
    sh = (c * 0).astype(jnp.int32)
    flat = dm.reshape(-1)
    lin = yi0 * 640 + xi0 + sh
    return jnp.sum(flat[lin])
timed("1d-linearized gather 3.8M", gather_1d)

def small_gather(c):
    sh = (c * 0).astype(jnp.int32)
    return jnp.sum(dm[yi0[:, :, :1920] + sh, xi0[:, :, :1920] + sh])
timed("gather 190k", small_gather)
