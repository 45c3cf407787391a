import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

NE, NT, NR = 32768, 180, 858
rng = np.random.default_rng(0)
tb0 = jnp.asarray(rng.integers(0, NT, NE), jnp.int32)
rb_all = jnp.asarray(rng.integers(0, NR, (3, NE)), jnp.int32)
w = jnp.asarray(rng.random(NE).astype(np.float32) * 500)

@jax.jit
def scatter_acc(wc):
    acc = jnp.zeros((NT, NR), jnp.float32)
    for dt_ in (-1, 0, 1):
        tb = (tb0 + dt_) % NT
        acc = acc.at[tb, rb_all[dt_ + 1]].add(wc)
    return acc

@jax.jit
def mm_acc_f32(wc):
    acc = jnp.zeros((NT, NR), jnp.float32)
    for dt_ in (-1, 0, 1):
        tb = (tb0 + dt_) % NT
        oh_t = (tb[:, None] == jnp.arange(NT)[None, :]).astype(jnp.float32)
        oh_r = (rb_all[dt_ + 1][:, None] == jnp.arange(NR)[None, :]).astype(jnp.float32)
        acc = acc + jnp.einsum("et,er->tr", oh_t * wc[:, None], oh_r,
                               precision=jax.lax.Precision.HIGHEST)
    return acc

a = np.asarray(scatter_acc(w)); b = np.asarray(mm_acc_f32(w))
print("max|diff| f32 mm vs scatter:", np.abs(a - b).max(), "rel:", np.abs(a-b).max()/a.max())

def timed(name, fn, n_lo=4, n_hi=32):
    @jax.jit
    def run(n):
        def body(_, c):
            acc = fn(w + c * 1e-32)
            return jnp.sum(acc) * 1e-42
        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.float32))
    float(np.asarray(run(np.int32(n_lo)))); float(np.asarray(run(np.int32(n_hi))))
    def best(n, reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(np.asarray(run(np.int32(n)))); ts.append(time.perf_counter()-t0)
        return min(ts)
    tl, th = best(np.int32(n_lo)), best(np.int32(n_hi))
    dt = max((th - tl) / (n_hi - n_lo), 0)
    print(f"{name:<30} {dt*1e3:8.3f} ms  (lo {tl*1e3:.1f} hi {th*1e3:.1f})", flush=True)

timed("scatter-add x3", scatter_acc)
timed("one-hot matmul x3 (f32)", mm_acc_f32)
