"""What dynamic-gather forms does Mosaic lower on this chip?

Tests, inside a real (non-interpret) pallas kernel:
  A. take_along_axis(tab, idx, axis=0)   per-lane row select (sublane gather)
  B. take_along_axis(row, idx, axis=1)   per-sublane lane shuffle
  C. A then B                             arbitrary 2D gather
  D. jnp.take(tab1d, idx1d)               1D (known to fail: "Only 2D")

    python scripts/micro_mosaic_gather.py
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 512, 128
B = 1024  # output rows per block


def timeit(f, *args, n=20, vary=None):
    out = f(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    for k in range(n):
        a = list(args)
        if vary is not None:
            a[vary] = a[vary] + k  # defeat runtime dispatch dedup
        out = f(*a)
    jax.block_until_ready(jax.tree.leaves(out))
    return (time.time() - t0) / n


def try_case(name, build):
    try:
        f, args, vary = build()
        out = f(*args)
        jax.block_until_ready(out)
        dt = timeit(f, *args, vary=vary)
        n_el = B * LANES
        print(f"{name:34s}: OK  {dt*1e3:8.3f} ms ({n_el/dt/1e9:7.2f} Gel/s)")
    except Exception as e:
        msg = str(e).replace("\n", " ")[:180]
        print(f"{name:34s}: FAIL {type(e).__name__}: {msg}")


def main():
    key = jax.random.PRNGKey(0)
    tab = jax.random.normal(key, (ROWS, LANES), jnp.float32)
    ridx = jax.random.randint(jax.random.PRNGKey(1), (B, LANES), 0, ROWS)
    lidx = jax.random.randint(jax.random.PRNGKey(2), (B, LANES), 0, LANES)

    def case_a():
        def kern(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

        f = jax.jit(lambda t, i: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, LANES), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, jnp.clip(i, 0, ROWS - 1)))
        return f, (tab, ridx), 1

    def case_b():
        src = jax.random.normal(key, (B, LANES), jnp.float32)

        def kern(src_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)

        f = jax.jit(lambda s, i: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, LANES), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(s, jnp.clip(i, 0, LANES - 1)))
        return f, (src, lidx), 1

    def case_c():
        def kern(tab_ref, ridx_ref, lidx_ref, out_ref):
            rows = jnp.take_along_axis(tab_ref[:], ridx_ref[:], axis=0)
            out_ref[:] = jnp.take_along_axis(rows, lidx_ref[:], axis=1)

        f = jax.jit(lambda t, r, l: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, LANES), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, jnp.clip(r, 0, ROWS - 1), jnp.clip(l, 0, LANES - 1)))
        return f, (tab, ridx, lidx), 1

    def case_d():
        tab1 = tab.reshape(-1)
        idx1 = (ridx * LANES + lidx)

        def kern(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take(tab_ref[:], idx_ref[:].reshape(-1),
                                  axis=0).reshape(B, LANES)

        f = jax.jit(lambda t, i: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, LANES), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, jnp.clip(i, 0, ROWS * LANES - 1)))
        return f, (tab1, idx1), 1

    def case_e():
        # gather via jnp.take with 2D operand axis=0 (whole-row pick, 1D idx)
        rvec = jax.random.randint(jax.random.PRNGKey(3), (B,), 0, ROWS)

        def kern(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

        f = jax.jit(lambda t, i: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, LANES), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, jnp.clip(i, 0, ROWS - 1)))
        return f, (tab, rvec), 1

    try_case("A axis0 take_along (row sel)", case_a)
    try_case("B axis1 take_along (lane shfl)", case_b)
    try_case("C arbitrary 2D (A then B)", case_c)
    try_case("D 1D flat take", case_d)
    try_case("E take rows w/ 1D idx", case_e)


if __name__ == "__main__":
    main()
