"""Probe which Mosaic gather forms lower on this TPU.

Determines the design for the round-3 image-texture gather (persistent
kernel) and any per-lane BVH traversal: can we gather along sublanes
(axis=0), and does a (8,128)-block 2D gather decompose cheaply?
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 8, 128


def probe(name, kernel, args, expect):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)
        ok = np.allclose(np.asarray(out), expect)
        print(f"{name}: compiled, correct={ok}")
        return ok
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAILED {type(e).__name__}: {msg}")
        return False


key = jax.random.PRNGKey(0)
tab = jnp.arange(ROWS * LANES, dtype=jnp.float32).reshape(ROWS, LANES)
idx_lane = jax.random.randint(key, (ROWS, LANES), 0, LANES)
idx_sub = jax.random.randint(jax.random.PRNGKey(1), (ROWS, LANES), 0, ROWS)

# 1. lane gather (known working)
def k_lane(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1,
                                     mode="promise_in_bounds")

expect1 = np.take_along_axis(np.asarray(tab), np.asarray(idx_lane), axis=1)
probe("lane-gather axis=1 (8,128)", k_lane, (tab, idx_lane), expect1)

# 2. sublane gather axis=0
def k_sub(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0,
                                     mode="promise_in_bounds")

expect2 = np.take_along_axis(np.asarray(tab), np.asarray(idx_sub), axis=0)
probe("sublane-gather axis=0 (8,128)", k_sub, (tab, idx_sub), expect2)

# 3. sublane gather on taller block (operand 64 rows, idx 64 rows)
R2 = 64
tab2 = jnp.arange(R2 * LANES, dtype=jnp.float32).reshape(R2, LANES)
idx2 = jax.random.randint(jax.random.PRNGKey(2), (R2, LANES), 0, R2)

def k_sub64(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0,
                                     mode="promise_in_bounds")

try:
    out = pl.pallas_call(
        k_sub64,
        out_shape=jax.ShapeDtypeStruct((R2, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab2, idx2)
    ok = np.allclose(np.asarray(out),
                     np.take_along_axis(np.asarray(tab2), np.asarray(idx2), axis=0))
    print(f"sublane-gather axis=0 (64,128): compiled, correct={ok}")
except Exception as e:
    print(f"sublane-gather axis=0 (64,128): FAILED {type(e).__name__}: "
          + str(e).split(chr(10))[0][:160])

# 4. gather where operand rows != idx rows (broadcast table block):
#    operand (8,128), idx (64,128) -> not take_along_axis semantics; skip.

# 5. 2D gather emulation on (8,128) block: sublane then lane
def k_2d(tab_ref, sidx_ref, lidx_ref, out_ref):
    g = jnp.take_along_axis(tab_ref[:], sidx_ref[:].astype(jnp.int32), axis=0,
                            mode="promise_in_bounds")
    out_ref[:] = jnp.take_along_axis(g, lidx_ref[:].astype(jnp.int32), axis=1,
                                     mode="promise_in_bounds")

sidx = jax.random.randint(jax.random.PRNGKey(3), (ROWS, LANES), 0, ROWS)
lidx = jax.random.randint(jax.random.PRNGKey(4), (ROWS, LANES), 0, LANES)
t = np.asarray(tab)
g = np.take_along_axis(t, np.asarray(sidx), axis=0)
expect5 = np.take_along_axis(g, np.asarray(lidx), axis=1)
probe("2D gather: sublane then lane (8,128)", k_2d,
      (tab, sidx.astype(jnp.float32).astype(jnp.int32), lidx), expect5)
