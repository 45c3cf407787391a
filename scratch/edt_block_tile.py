"""Round-5 EDT row-kernel attempt: 128x128 block-transposed tiling.

The shipping kernel (ops/pallas_kernels.edt_row_min) computes, per 8-row
program, min over source-column chunks with an (8, W, 128) inner tensor.
This variant tiles BOTH the output-x and source-x axes to 128 (grid =
(row blocks, output blocks), inner fori over source blocks, (8, 128, 128)
tiles) so every vector op is exactly register-shaped — the verdict-5
"block-transposed layout with 128-aligned offsets" design.

Measures both on identical inputs, checks bit-equality, prints ms.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")
from cube_slam_wu_tpu.ops.pallas_kernels import edt_row_min  # noqa: E402

_BH = 8
_BX = 128  # output columns per program
_BS = 128  # source columns per inner step


def _edt_block_kernel(a_ref, out_ref, *, Wp):
    # a_ref: (BH, Wp) full source row block; out_ref: (BH, BX)
    j = pl.program_id(1)
    x0 = (j * _BX).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, _BX), 1).astype(jnp.float32) + x0
    x2 = xs * xs

    def body(c, acc):
        a_src = a_ref[:, pl.ds(c * _BS, _BS)]  # (BH, BS)
        src_x = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _BS), 2).astype(
            jnp.float32
        ) + (c * _BS).astype(jnp.float32)
        d = a_src[:, None, :] - (2.0 * xs)[:, :, None] * src_x  # (BH, BX, BS)
        return jnp.minimum(acc, jnp.min(d, axis=-1))

    acc0 = jnp.full((a_ref.shape[0], _BX), 1e18, jnp.float32)
    acc = jax.lax.fori_loop(0, Wp // _BS, body, acc0)
    out_ref[:] = jnp.sqrt(jnp.maximum(acc + x2, 0.0))


@functools.partial(jax.jit, static_argnames=())
def edt_row_min_blocked(g2: jnp.ndarray) -> jnp.ndarray:
    H, W = g2.shape
    Hp = -(-H // _BH) * _BH
    Wp = -(-W // _BS) * _BS
    g2p = jnp.full((Hp, Wp), 1e18, jnp.float32)
    g2p = g2p.at[:H, :W].set(g2.astype(jnp.float32))
    xs = jnp.arange(Wp, dtype=jnp.float32)
    a = g2p + xs * xs

    out = pl.pallas_call(
        functools.partial(_edt_block_kernel, Wp=Wp),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        grid=(Hp // _BH, Wp // _BX),
        in_specs=[
            pl.BlockSpec((_BH, Wp), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (_BH, _BX), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
    )(a)
    return out[:H, :W]


def timed(name, fn, g2, n_lo=4, n_hi=64):
    @jax.jit
    def run(n):
        def body(_, c):
            r = fn(g2 + c * 1e-32)
            return jnp.sum(r) * 1e-42

        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.float32))

    float(np.asarray(run(np.int32(n_lo))))
    float(np.asarray(run(np.int32(n_hi))))

    def best(n, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(run(np.int32(n))))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = max((best(np.int32(n_hi)) - best(np.int32(n_lo))) / (n_hi - n_lo), 0)
    print(f"{name:<28} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    # ROI-shaped map: sparse edges -> g2 from a column pass (values small
    # near edges, large elsewhere); use random squared verticals
    H, W = 480, 640
    g2 = (rng.integers(0, 40, size=(H, W)) ** 2).astype(np.float32)
    g2j = jnp.asarray(g2)

    r1 = np.asarray(edt_row_min(g2j))
    r2 = np.asarray(edt_row_min_blocked(g2j))
    print("bit-equal:", np.array_equal(r1, r2), "max|diff|:", np.abs(r1 - r2).max())

    timed("shipping (8,W,128)", edt_row_min, g2j)
    timed("blocked (8,128,128)", edt_row_min_blocked, g2j)


if __name__ == "__main__":
    main()
