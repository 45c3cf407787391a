"""Pallas TPU kernels for hot image ops.

The exact-EDT row reduction is the densest loop in the proposal front-end
(distance D(y,x) = min_x' (x-x')^2 + g(y,x')^2 after the 1-D column scan;
see ops.image.distance_transform).  The XLA version materialises chunked
(rows, W, W) intermediates in HBM; this kernel keeps everything in VMEM and
streams source-column chunks, so each grid step is pure VPU work on
(BH, W, BW) tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BH = 8  # output rows per program
_BW = 128  # source columns per inner step


def _edt_row_kernel(g2_ref, out_ref):
    """g2_ref, out_ref: (BH, W) blocks in VMEM."""
    W = g2_ref.shape[1]
    # Mosaic's tpu.iota only produces integers; cast afterwards
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(jnp.float32)

    def body(c, acc):
        src = g2_ref[:, pl.ds(c * _BW, _BW)]  # (BH, BW) squared col-dists
        src_x = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _BW), 2).astype(
            jnp.float32
        ) + (c * _BW).astype(jnp.float32)
        d = (xs[:, :, None] - src_x) ** 2 + src[:, None, :]  # (BH, W, BW)
        return jnp.minimum(acc, jnp.min(d, axis=-1))

    acc0 = jnp.full(g2_ref.shape, 1e18, jnp.float32)
    acc = jax.lax.fori_loop(0, W // _BW, body, acc0)
    out_ref[:] = jnp.sqrt(acc)


@functools.partial(jax.jit, static_argnames=("interpret",))
def edt_row_min(g2: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """sqrt(min_x' ((x - x')^2 + g2[y, x'])) per row, as a Pallas kernel.

    g2 is padded to multiples of (8 rows, 128 cols) with +inf-like values so
    the reduction is unaffected.
    """
    H, W = g2.shape
    Hp = -(-H // _BH) * _BH
    Wp = -(-W // _BW) * _BW
    g2p = jnp.full((Hp, Wp), 1e18, jnp.float32)
    g2p = g2p.at[:H, :W].set(g2.astype(jnp.float32))

    out = pl.pallas_call(
        _edt_row_kernel,
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        grid=(Hp // _BH,),
        in_specs=[
            pl.BlockSpec((_BH, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((_BH, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(g2p)
    return out[:H, :W]
