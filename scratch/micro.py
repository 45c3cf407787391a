import time, numpy as np, jax, jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")
dtype = jnp.float32
N = 19200
x = jnp.asarray(np.random.default_rng(0).random(N), dtype)
dm = jnp.asarray(np.random.default_rng(1).random((480, 640)), dtype)
idx = jnp.asarray(np.random.default_rng(2).integers(0, 479, size=(N, 99)))
idx2 = jnp.asarray(np.random.default_rng(3).integers(0, 639, size=(N, 99)))

def timed(name, fn, n_lo=8, n_hi=64):
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
    print(f"{name:<30} {dt*1e3:8.3f} ms", flush=True)

timed("argsort 19200 (stable)", lambda c: jnp.sum(jnp.argsort(x + c, stable=True).astype(dtype)))
timed("sort 19200", lambda c: jnp.sum(jnp.sort(x + c)))
timed("top_k 12800 of 19200", lambda c: jnp.sum(jax.lax.top_k(x + c, 12800)[0]))
timed("gather 1.9M from (480,640)", lambda c: jnp.sum(dm[idx, idx2] + c))
timed("argmin 19200", lambda c: (x + c)[jnp.argmin(x + c)])
