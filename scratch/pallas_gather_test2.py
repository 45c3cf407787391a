import os, sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 256, 256
rng = np.random.default_rng(0)
table = rng.standard_normal((H, W)).astype(np.float32)


def run(name, kernel, out_shape, *args):
    try:
        got = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(args)),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, *args)
        return np.asarray(got)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None


# C0: axis=0 take_along_axis, full width
y2 = rng.integers(0, H, (8, W)).astype(np.int32)


def kc0(tab, idx, out):
    out[:] = jnp.take_along_axis(tab[:], idx[:], axis=0)


g = run("axis0", kc0, (8, W), y2)
if g is not None:
    exp = np.take_along_axis(table, y2, axis=0)
    print("axis0 match:", np.allclose(g, exp), "maxerr", np.abs(g - exp).max(), flush=True)
    # where wrong?
    bad = np.nonzero(~np.isclose(g, exp))
    print("n bad:", len(bad[0]), "first few:", [ (int(bad[0][i]), int(bad[1][i])) for i in range(min(5,len(bad[0])))], flush=True)

# C1: axis=1 take_along_axis (lane gather)
x2 = rng.integers(0, W, (256, 128)).astype(np.int32)


def kc1(tab, idx, out):
    out[:] = jnp.take_along_axis(tab[:], idx[:], axis=1)


g = run("axis1", kc1, (256, 128), x2)
if g is not None:
    exp = np.take_along_axis(table, x2, axis=1)
    print("axis1 match:", np.allclose(g, exp), flush=True)

# D: full 2D table lookup out[i,j] = table[y[i,j], x[i,j]] via two-step:
# rows = take_along_axis(table, y, axis=0) gathers per-column from column j.
# But we need table[y[i,j], x[i,j]] — compose: first gather rows by y along
# axis 0 with the COLUMN being x's destination... not directly expressible.
# Instead: flat = table.reshape(1, H*W) broadcast to (rows, H*W)?  Too big.
# Try: out[i,j] = take_along_axis(take_along_axis(table, y, 0), x, ???) no.
# E: dynamic row then lane gather, looped over sublanes via fori? test the
# primitive cost instead: single dynamic row read tab[pl.ds(i,1), :]
def ke(tab, idx, out):
    def body(i, _):
        row = tab[idx[i, 0], :]  # dynamic scalar row index -> (W,)
        out[i, :] = row
        return 0

    jax.lax.fori_loop(0, 8, body, 0)


g = run("dyn_row_loop", ke, (8, W), y2)
if g is not None:
    exp = table[y2[:, 0], :]
    print("dyn_row match:", np.allclose(g, exp), flush=True)
