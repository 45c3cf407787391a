"""Microbench: TPU gather formulations for the proposal dist-map lookup.
Indices are passed as jit ARGUMENTS (closure constants embed 90MB literals
and stall the remote compile)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

H = 19200
S = (9, 11, H)
rng = np.random.default_rng(0)


def timed(f, *args, n_lo=1, n_hi=9):
    # slope between n_lo and n_hi sequential dependent applications
    def chain(n):
        @jax.jit
        def run(M, idx):
            def body(c, _):
                M2 = M + c.astype(M.dtype) * 0
                tot = c
                for yi, xi in idx:
                    tot = tot + f(M2, yi, xi)
                return tot, None
            out, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), None, length=n)
            return out
        return run

    f_lo, f_hi = chain(n_lo), chain(n_hi)
    float(np.asarray(f_lo(*args)))
    float(np.asarray(f_hi(*args)))

    def best(g, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(g(*args)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return max((best(f_hi) - best(f_lo)) / (n_hi - n_lo), 1e-9)


def g2d(M, yi, xi):
    return jnp.sum(M[yi, xi].astype(jnp.float32))


def g1d(M, yi, xi):
    return jnp.sum(jnp.take(M.ravel(), yi * M.shape[1] + xi).astype(jnp.float32))


def run_case(mh, mw, dtype, n_gathers=6):
    M = jnp.asarray(rng.uniform(0, 300, size=(mh, mw)), dtype)
    idx = tuple(
        (
            jnp.asarray(rng.integers(0, mh, size=S), jnp.int32),
            jnp.asarray(rng.integers(0, mw, size=S), jnp.int32),
        )
        for _ in range(n_gathers)
    )
    tag = f"map {mh}x{mw} {jnp.dtype(dtype).name} x{n_gathers}"
    print(f"2d gather    {tag} {timed(g2d, M, idx)*1e3:8.3f} ms", flush=True)
    print(f"1d flat take {tag} {timed(g1d, M, idx)*1e3:8.3f} ms", flush=True)


print(f"device: {jax.devices()[0]}", flush=True)
run_case(480, 640, jnp.float32)
run_case(128, 128, jnp.float32)
run_case(480, 640, jnp.bfloat16)
run_case(8, 128, jnp.float32)
run_case(480, 640, jnp.float32, n_gathers=1)
