"""Bisect the slowness of project_classed at phase shapes.

    python scripts/micro_gather3.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from thunder_tpu.ops.projector import (
    project_classed, _corners, _unpack_ri, ri_split,
)
from thunder_tpu.ops.fourier import pack_rings
from thunder_tpu.geometry.quaternion import random_quat, rotate3d


def timeit(f, *args, n=10):
    out = f(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    return (time.time() - t0) / n


L, R, BIG, SIZE, PF = 128, 32, 60, 128, 2


class RV:
    def __init__(self, i_col, i_row, size):
        self.i_col = i_col
        self.i_row = i_row
        self.size = size


def main():
    key = jax.random.PRNGKey(0)
    # packed rings at local-search radius (matches profile_phase: P=288)
    rings = pack_rings(SIZE, 14, 0)
    P = rings.i_col.shape[0]
    print(f"P = {P}")

    spec = jax.random.normal(key, (1, BIG, BIG, BIG), jnp.complex64)
    ps = ri_split(spec)                                   # (1, BIG,BIG,BIG) u32
    cls = jnp.zeros((L,), jnp.int32)
    rot = rotate3d(random_quat(key, (L, R)))
    rv = RV(rings.i_col, rings.i_row, SIZE)
    taps8 = L * R * P * 8

    f0 = jax.jit(lambda ps, cls, rot: project_classed(ps, cls, rot, rv, PF, False))
    dt = timeit(f0, ps, cls, rot)
    print(f"project_classed (production)      : {dt*1e3:8.2f} ms ({taps8/dt/1e9:6.2f} Gtaps/s)")

    # variant A: same but coords precomputed outside jit
    fx = (rings.i_col * PF).astype(jnp.float32)
    fy = (rings.i_row * PF).astype(jnp.float32)
    x = rot[..., 0, 0:1] * fx + rot[..., 0, 1:2] * fy
    y = rot[..., 1, 0:1] * fx + rot[..., 1, 1:2] * fy
    z = rot[..., 2, 0:1] * fx + rot[..., 2, 1:2] * fy
    x, y, z = jax.block_until_ready((x, y, z))

    def gA(ps, x, y, z):
        flat = ps.reshape(-1)
        ix, iy, wx, wy = _corners(x, y, BIG)
        iz, _, wz, _ = _corners(z, z, BIG)
        outr = 0.0
        outi = 0.0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    w = ((wz if dz else 1 - wz) * (wy if dy else 1 - wy)
                         * (wx if dx else 1 - wx))
                    xi = jnp.clip(ix + dx, 0, BIG - 1)
                    yi = jnp.clip(iy + dy, 0, BIG - 1)
                    zi = jnp.clip(iz + dz, 0, BIG - 1)
                    lin = (zi * BIG + yi) * BIG + xi
                    re, im = _unpack_ri(jnp.take(flat, lin, axis=0))
                    outr += re * w
                    outi += im * w
        return jax.lax.complex(outr, outi)
    dt = timeit(jax.jit(gA), ps, x, y, z)
    print(f"A precomputed coords              : {dt*1e3:8.2f} ms ({taps8/dt/1e9:6.2f} Gtaps/s)")

    # variant B: like A but no weights (pure 8-tap sum)
    def gB(ps, x, y, z):
        flat = ps.reshape(-1)
        ix, iy, wx, wy = _corners(x, y, BIG)
        iz, _, wz, _ = _corners(z, z, BIG)
        outr = 0.0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    xi = jnp.clip(ix + dx, 0, BIG - 1)
                    yi = jnp.clip(iy + dy, 0, BIG - 1)
                    zi = jnp.clip(iz + dz, 0, BIG - 1)
                    lin = (zi * BIG + yi) * BIG + xi
                    outr += jnp.take(flat, lin, axis=0)
        return outr
    dt = timeit(jax.jit(gB), ps, x, y, z)
    print(f"B no weights/unpack               : {dt*1e3:8.2f} ms ({taps8/dt/1e9:6.2f} Gtaps/s)")

    # variant C: single tap only
    def gC(ps, x, y, z):
        flat = ps.reshape(-1)
        ix, iy, wx, wy = _corners(x, y, BIG)
        iz, _, wz, _ = _corners(z, z, BIG)
        lin = (iz * BIG + iy) * BIG + ix
        return jnp.take(flat, lin, axis=0)
    dt = timeit(jax.jit(gC), ps, x, y, z)
    print(f"C single tap                      : {dt*1e3:8.2f} ms ({L*R*P/dt/1e9:6.2f} Gtaps/s)")

    # variant D: random precomputed indices same shape (the fast micro)
    idx = jax.random.randint(jax.random.PRNGKey(2), (L, R, P), 0, BIG**3)
    fD = jax.jit(lambda ps, i: jnp.take(ps.reshape(-1), i, axis=0))
    dt = timeit(fD, ps, idx)
    print(f"D random idx single tap           : {dt*1e3:8.2f} ms ({L*R*P/dt/1e9:6.2f} Gtaps/s)")

    # variant E: C but indices derived with int arithmetic only from idx
    def gE(ps, i):
        flat = ps.reshape(-1)
        out = 0.0
        for d in range(8):
            out += jnp.take(flat, jnp.clip(i + d, 0, BIG**3 - 1), axis=0)
        return out
    dt = timeit(jax.jit(gE), ps, idx)
    print(f"E 8-tap from random idx           : {dt*1e3:8.2f} ms ({taps8/dt/1e9:6.2f} Gtaps/s)")


if __name__ == "__main__":
    main()
