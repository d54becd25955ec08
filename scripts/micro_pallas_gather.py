"""Gather strategy shoot-out on the real chip.

The slice-projection gather is the measured bottleneck (~7.5 ns per
4-byte tap via XLA's gather = ~0.5 GB/s, 3 orders below HBM).  Candidates:

  a) XLA flat jnp.take (current production path)
  b) Pallas kernel, table resident in VMEM, jnp.take inside the kernel
     (does Mosaic lower a vectorized dynamic gather?)
  c) one-hot matmul gather on the MXU (cost ~ table_size x n_samples
     MACs in bf16 — viable only for small tables, but MXU is 200+ TFLOPS)

    python scripts/micro_pallas_gather.py [table_mb] [n_samples_m]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(f, *args, n=5):
    f(*args).block_until_ready()
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    out.block_until_ready()
    return (time.time() - t0) / n


def main():
    n_elem = int(float(sys.argv[1]) if len(sys.argv) > 1 else 1.0 * 2**20 // 4) * 4
    n_samples = int(float(sys.argv[2]) if len(sys.argv) > 2 else 2.0) * 2**20
    n_samples = int(n_samples)

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (n_elem,), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (n_samples,), 0, n_elem)

    # a) XLA flat take
    f_take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    dt = timeit(f_take, table, idx)
    print(f"a) XLA take         : {dt * 1e3:8.2f} ms  "
          f"({n_samples / dt / 1e9:.2f} Gtaps/s)")

    # b) Pallas VMEM gather
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BLK = 128 * 1024

    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def f_pallas(t, i):
        grid = (i.shape[0] // BLK,)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(i.shape, t.dtype),
            grid_spec=pl.GridSpec(
                grid=grid,
                in_specs=[
                    pl.BlockSpec((t.shape[0],), lambda g: (0,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLK,), lambda g: (g,),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK,), lambda g: (g,),
                                       memory_space=pltpu.VMEM),
            ),
        )(t, i)

    try:
        dt = timeit(f_pallas, table, idx)
        print(f"b) Pallas VMEM take : {dt * 1e3:8.2f} ms  "
              f"({n_samples / dt / 1e9:.2f} Gtaps/s)")
    except Exception as e:
        print(f"b) Pallas VMEM take : FAILED ({type(e).__name__}: "
              f"{str(e)[:300]})")

    # b2) Pallas 2D-shaped gather (table as (rows, 128) lanes,
    #     take_along_axis within rows)
    rows = n_elem // 128

    def kernel2(tab_ref, row_ref, col_ref, out_ref):
        tab = tab_ref[:]                                  # (rows, 128)
        r = row_ref[:]                                    # (BLK2, 128) int32
        c = col_ref[:]
        picked_rows = jnp.take(tab, r.reshape(-1), axis=0).reshape(
            r.shape + (128,))
        out_ref[:] = jnp.take_along_axis(
            picked_rows, c[..., None], axis=-1)[..., 0]

    BLK2 = 1024

    @jax.jit
    def f_pallas2(t, i):
        t2 = t.reshape(rows, 128)
        r = (i // 128).reshape(-1, 128).astype(jnp.int32)
        c = (i % 128).reshape(-1, 128).astype(jnp.int32)
        grid = (r.shape[0] // BLK2,)
        return pl.pallas_call(
            kernel2,
            out_shape=jax.ShapeDtypeStruct(r.shape, t.dtype),
            grid_spec=pl.GridSpec(
                grid=grid,
                in_specs=[
                    pl.BlockSpec((rows, 128), lambda g: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLK2, 128), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLK2, 128), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK2, 128), lambda g: (g, 0),
                                       memory_space=pltpu.VMEM),
            ),
        )(t2, r, c).reshape(-1)

    try:
        dt = timeit(f_pallas2, table, idx)
        print(f"b2) Pallas 2D take  : {dt * 1e3:8.2f} ms  "
              f"({n_samples / dt / 1e9:.2f} Gtaps/s)")
    except Exception as e:
        print(f"b2) Pallas 2D take  : FAILED ({type(e).__name__}: "
              f"{str(e)[:300]})")


if __name__ == "__main__":
    main()
