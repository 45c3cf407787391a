"""Quantify per-kernel fixed overhead on the axon TPU: time a chain of K
non-fusible kernels (alternating reduce+broadcast breaks fusion) on a small
(19200,) array, via the serializing lax.scan slope trick (see bench.py)."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp


def chain(x, k):
    # alternating elementwise + tiny reduce->broadcast, defeats fusion into one
    for _ in range(k):
        s = jnp.sum(x) / x.size  # reduce kernel
        x = x * 0.999 + s * 0.001  # elementwise kernel
    return x


def make(k, n):
    @jax.jit
    def run(x):
        def body(c, _):
            return chain(c, k), None

        y, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(y)

    return run


x = jnp.ones((19200,), jnp.float32)
for k in (1, 8, 32):
    def t(n):
        f = make(k, n)
        np.asarray(f(x))  # compile+warm
        t0 = time.perf_counter()
        np.asarray(f(x))
        return time.perf_counter() - t0

    lo, hi = 20, 100
    tlo, thi = t(lo), t(hi)
    per_iter = (thi - tlo) / (hi - lo)
    print(
        f"k={k:3d} kernels/iter~{2*k:3d}  per-iter={per_iter*1e3:.3f} ms "
        f"-> per-kernel={per_iter/(2*k)*1e6:.1f} us",
        flush=True,
    )
