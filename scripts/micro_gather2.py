"""Why is the projector gather 0.13 Gtaps/s from an 864KB table?

Replicates the packed trilinear gather at phase-loop shapes
(L=128, R=32, P=288, big=60) and isolates: index computation vs take,
table dtype, index shape/padding, 8-tap structure.

    python scripts/micro_gather2.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(f, *args, n=10):
    out = f(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    return (time.time() - t0) / n


L, R, P, BIG = 128, 32, 288, 60


def report(name, dt, taps):
    print(f"{name:44s}: {dt*1e3:8.2f} ms ({taps/dt/1e9:6.2f} Gtaps/s)")


def main():
    key = jax.random.PRNGKey(0)
    n_elem = BIG**3
    tab_u32 = jax.random.randint(key, (n_elem,), 0, 2**31 - 1).astype(jnp.uint32)
    tab_f32 = jax.random.normal(key, (n_elem,), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (L, R, P), 0, n_elem - BIG*BIG - BIG - 2)
    taps1 = L * R * P
    taps8 = taps1 * 8

    # 1: single take, precomputed idx, f32 table
    f1 = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    report("1 take f32 (L,R,P)", timeit(f1, tab_f32, idx), taps1)

    # 2: single take, u32 table
    report("2 take u32 (L,R,P)", timeit(f1, tab_u32, idx), taps1)

    # 3: 8 dependent taps + unpack, like _gather_packed_trilinear
    def f3(t, i):
        outr = 0.0
        outi = 0.0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    lin = i + (dz * BIG + dy) * BIG + dx
                    w = jnp.take(t, lin, axis=0)
                    re = jax.lax.bitcast_convert_type(
                        (w & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
                    im = jax.lax.bitcast_convert_type(
                        (w >> 16).astype(jnp.uint16), jnp.bfloat16)
                    outr += re.astype(jnp.float32) * 0.125
                    outi += im.astype(jnp.float32) * 0.125
        return outr, outi
    report("3 8-tap u32+unpack", timeit(jax.jit(f3), tab_u32, idx), taps8)

    # 4: 8 taps f32, no unpack
    def f4(t, i):
        out = 0.0
        for d in range(8):
            out += jnp.take(t, i + d, axis=0)
        return out
    report("4 8-tap f32 plain", timeit(jax.jit(f4), tab_f32, idx), taps8)

    # 5: computed indices (floor/clip from float coords), 8 taps f32
    fx = jax.random.uniform(key, (L, R, P), jnp.float32, -25.0, 25.0)
    fy = jax.random.uniform(key, (L, R, P), jnp.float32, -25.0, 25.0)
    fz = jax.random.uniform(key, (L, R, P), jnp.float32, -25.0, 25.0)

    def f5(t, x, y, z):
        c = BIG // 2
        ix = jnp.floor(x).astype(jnp.int32) + c
        iy = jnp.floor(y).astype(jnp.int32) + c
        iz = jnp.floor(z).astype(jnp.int32) + c
        out = 0.0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    xi = jnp.clip(ix + dx, 0, BIG - 1)
                    yi = jnp.clip(iy + dy, 0, BIG - 1)
                    zi = jnp.clip(iz + dz, 0, BIG - 1)
                    lin = (zi * BIG + yi) * BIG + xi
                    out += jnp.take(t, lin, axis=0)
        return out
    report("5 8-tap f32 computed idx", timeit(jax.jit(f5), tab_f32, fx, fy, fz), taps8)

    # 6: index shape 1D flat vs 3D
    idx_flat = idx.reshape(-1)
    report("6 take f32 flat idx", timeit(f1, tab_f32, idx_flat), taps1)

    # 7: last dim padded to multiple of 128 (P=384)
    idx_pad = jax.random.randint(jax.random.PRNGKey(2), (L, R, 384), 0, n_elem)
    report("7 take f32 (L,R,384)", timeit(f1, tab_f32, idx_pad), L * R * 384)

    # 8: 2D table (rows, 128) one-row gather: jnp.take rows then lane select
    rows = (n_elem + 127) // 128
    tab2 = jnp.pad(tab_f32, (0, rows * 128 - n_elem)).reshape(rows, 128)

    def f8(t2, i):
        r = (i // 128).reshape(-1)
        c = (i % 128).reshape(-1)
        picked = jnp.take(t2, r, axis=0)               # (N, 128)
        return jnp.take_along_axis(picked, c[:, None], axis=1)
    report("8 row-take+lane-select", timeit(jax.jit(f8), tab2, idx), taps1)

    # 9: one-hot matmul gather on MXU (table 864KB: 216000x? too big);
    #    but per-z-plane: decompose into z-select then 2D... instead try
    #    dynamic_slice-free: einsum over one-hot of rows in blocks
    #    (skip: table too large for one-hot)

    # 10: vmap per-image gather (indices (R,P) per call)
    def f10(t, i):
        return jax.vmap(lambda ii: jnp.take(t, ii, axis=0))(i)
    report("10 vmapped take f32", timeit(jax.jit(f10), tab_f32, idx), taps1)


if __name__ == "__main__":
    main()
