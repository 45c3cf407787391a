"""Feasibility: vector gather from a VMEM-resident 2D table inside a Pallas
TPU kernel (needed for the fused proposal kernel's chamfer lookups).

Tries three formulations:
  A. direct 2D vector indexing  table[yi, xi]
  B. flattened 1D vector indexing  flat[yi * W + xi]
  C. jnp.take_along_axis on the lane axis after a row-gather
"""
import os, sys, traceback

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("jax", jax.__version__, "devices", jax.devices(), flush=True)

H, W = 256, 256
N = 1024
rng = np.random.default_rng(0)
table = rng.standard_normal((H, W)).astype(np.float32)
yi = rng.integers(0, H, N).astype(np.int32)
xi = rng.integers(0, W, N).astype(np.int32)
expect = table[yi, xi]


def try_variant(name, fn):
    try:
        out = np.asarray(fn())
        ok = np.allclose(out, expect)
        print(f"{name}: ran, match={ok}", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)


# A: direct 2D vector indexing
def kernel_a(tab_ref, y_ref, x_ref, out_ref):
    out_ref[:] = tab_ref[y_ref[:], x_ref[:]]


def run_a():
    return pl.pallas_call(
        kernel_a,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, yi, xi)


# B: flatten to 1D then vector index
def kernel_b(tab_ref, idx_ref, out_ref):
    flat = tab_ref[:].reshape(-1)
    out_ref[:] = flat[idx_ref[:]]


def run_b():
    flat_idx = (yi.astype(np.int32) * W + xi).astype(np.int32)
    return pl.pallas_call(
        kernel_b,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, flat_idx)


# C: take_along_axis 2D form: out[i, j] = tab2[idx2[i, j], j] (sublane gather)
def kernel_c(tab_ref, y2_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], y2_ref[:], axis=0)


def run_c():
    # gather N//W-ish rows: emulate out[k, j] = table[y2[k, j], j]
    y2 = rng.integers(0, H, (8, W)).astype(np.int32)
    got = pl.pallas_call(
        kernel_c,
        out_shape=jax.ShapeDtypeStruct((8, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, y2)
    exp = np.take_along_axis(table, np.asarray(y2), axis=0)
    assert np.allclose(np.asarray(got), exp), "C mismatch"
    print("C inner ok", flush=True)
    return expect  # trivially matches


try_variant("A_direct_2d", run_a)
try_variant("B_flat_1d", run_b)
try_variant("C_take_along_sublane", run_c)
