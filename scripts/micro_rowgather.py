"""Row-gather based trilinear slice extraction: primitive benchmarks.

The element-wise XLA gather runs at ~8 ns/tap (scalar loop).  The
alternative: fetch whole (z,y) rows (x along 128 lanes) and lane-select
with a 2-hot dot.  Tests, honestly (indices vary per call to defeat the
axon dispatch dedup):

  F. XLA row-gather tab[(S,) idx] -> (S, 128)
  G. XLA full trilinear via row-gather + 2-hot lane dot
  H. Pallas dynamic_gather[0] (broadcast row select) same-shape form
  I. current production-style 8-tap flat take (reference point)

    python scripts/micro_rowgather.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Z = Y = 60
X = 128            # x-padded to lanes
S = 128 * 32 * 296 // 128 * 128   # taps, lane-rounded (~1.21M)


def timeit(f, mk_args, n=10):
    out = f(*mk_args(0))
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    for k in range(n):
        out = f(*mk_args(k + 1))
    jax.block_until_ready(jax.tree.leaves(out))
    return (time.time() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    tab = jax.random.normal(key, (Z * Y, X), jnp.float32)
    zy_all = jax.random.randint(jax.random.PRNGKey(1), (12, S), 0, Z * Y - Y - 1)
    xf_all = jax.random.uniform(jax.random.PRNGKey(2), (12, S), jnp.float32,
                                0.0, 58.0)
    jax.block_until_ready((tab, zy_all, xf_all))

    # F: plain row gather
    fF = jax.jit(lambda t, zy: jnp.take(t, zy, axis=0))
    dt = timeit(fF, lambda k: (tab, zy_all[k % 12]))
    print(f"F XLA row-gather          : {dt*1e3:8.2f} ms "
          f"({S/dt/1e9:6.2f} Grow/s, {S*X*4/dt/1e9:7.1f} GB/s)")

    # G: full trilinear-ish (4 corner rows + 2-hot lane dot), chunked scan
    CH = 8192

    def trilin(t, zy, xf):
        lane = jnp.arange(X, dtype=jnp.int32)

        def chunk(carry, io):
            zy_c, xf_c = io
            ix = jnp.floor(xf_c).astype(jnp.int32)
            wx = xf_c - ix
            two_hot = ((lane[None, :] == ix[:, None]) * (1 - wx[:, None])
                       + (lane[None, :] == ix[:, None] + 1) * wx[:, None])
            acc = 0.0
            for dzy in (0, 1, Y, Y + 1):      # 4 (z,y) corners
                rows = jnp.take(t, jnp.clip(zy_c + dzy, 0, Z * Y - 1), axis=0)
                acc += jnp.sum(rows * two_hot, axis=-1)
            return carry, acc

        _, out = jax.lax.scan(
            chunk, 0.0, (zy.reshape(-1, CH), xf.reshape(-1, CH)))
        return out.reshape(-1)

    fG = jax.jit(trilin)
    dt = timeit(fG, lambda k: (tab, zy_all[k % 12], xf_all[k % 12]))
    taps = S * 4
    print(f"G XLA rowgather+2hot dot  : {dt*1e3:8.2f} ms "
          f"({taps/dt/1e9:6.2f} Gtap/s eq)")

    # H: pallas dynamic_gather[0], same-shape broadcast row select
    BLK = Z * Y  # 3600 rows per block: operand/idx/out all (3600, 128)

    def kern(tab_ref, zy_ref, out_ref):
        idx = zy_ref[:]                         # (BLK, 128) already broadcast
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx, axis=0)

    n_blk = S // BLK + (1 if S % BLK else 0)
    S_pad = n_blk * BLK

    @jax.jit
    def fH(t, zy):
        zy_p = jnp.pad(zy, (0, S_pad - S)).reshape(n_blk, BLK)
        zy_b = jnp.broadcast_to(zy_p[:, :, None], (n_blk, BLK, X)).reshape(
            n_blk * BLK, X)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n_blk * BLK, X), jnp.float32),
            grid_spec=pl.GridSpec(
                grid=(n_blk,),
                in_specs=[
                    pl.BlockSpec((Z * Y, X), lambda g: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLK, X), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK, X), lambda g: (g, 0),
                                       memory_space=pltpu.VMEM),
            ),
        )(t, jnp.clip(zy_b, 0, Z * Y - 1))

    try:
        dt = timeit(fH, lambda k: (tab, zy_all[k % 12]))
        print(f"H pallas dyngather rows   : {dt*1e3:8.2f} ms "
              f"({S/dt/1e9:6.2f} Grow/s, {S*X*4/dt/1e9:7.1f} GB/s)")
    except Exception as e:
        print(f"H pallas dyngather rows   : FAIL {type(e).__name__}: "
              f"{str(e)[:160]}")

    # I: reference point, current 8-tap scalar-ish flat take
    flat = tab.reshape(-1)

    def f8(t, zy, xf):
        ix = jnp.floor(xf).astype(jnp.int32)
        lin = zy * X + ix
        out = 0.0
        for d in (0, 1, X, X + 1, Y * X, Y * X + 1, (Y + 1) * X, (Y + 1) * X + 1):
            out += jnp.take(t, jnp.clip(lin + d, 0, Z * Y * X - 1), axis=0)
        return out
    fI = jax.jit(f8)
    dt = timeit(fI, lambda k: (flat, zy_all[k % 12], xf_all[k % 12]))
    print(f"I XLA 8-tap flat take     : {dt*1e3:8.2f} ms "
          f"({S*8/dt/1e9:6.2f} Gtap/s)")


if __name__ == "__main__":
    main()
