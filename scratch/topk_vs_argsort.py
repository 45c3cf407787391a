"""Is the capped-gather compaction's full argsort the right selection op?

Shapes from the real engine: Hc = 25 roll/pitch x 16 yaw x 24 top samples
= 9600 hypotheses; caps 4608 (config 1) / 1536 (config 2), x3 height
samples each per object.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

Hc = 9600


def timed(fn, *args, n=200):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else fn(
        *args
    ).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    (r[0] if isinstance(r, tuple) else r).block_until_ready()
    return (time.perf_counter() - t0) / n * 1e3


key = jax.random.uniform(jax.random.PRNGKey(0), (Hc,), jnp.float32)

for Kc in (4608, 1536):
    f_sort = jax.jit(lambda k, Kc=Kc: jnp.argsort(k, stable=True)[:Kc])
    f_topk = jax.jit(lambda k, Kc=Kc: jax.lax.top_k(-k, Kc)[1])
    ms_sort = timed(f_sort, key)
    ms_topk = timed(f_topk, key)
    print(f"Kc={Kc}: argsort[:Kc] {ms_sort:.3f} ms  top_k {ms_topk:.3f} ms")

# the whole compaction block: select + gather-shaped scatter back
def block_sort(k, d):
    order = jnp.argsort(k, stable=True)[:4608]
    return jnp.zeros((Hc,), jnp.float32).at[order].set(d[:4608])


def block_topk(k, d):
    order = jax.lax.top_k(-k, 4608)[1]
    return jnp.zeros((Hc,), jnp.float32).at[order].set(d[:4608])


d = jax.random.uniform(jax.random.PRNGKey(1), (Hc,), jnp.float32)
print(f"block sort+scatter {timed(jax.jit(block_sort), key, d):.3f} ms  "
      f"block topk+scatter {timed(jax.jit(block_topk), key, d):.3f} ms")
