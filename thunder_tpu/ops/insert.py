"""Weighted Fourier insertion (backprojection).

Reference: Reconstructor::insertP (Reconstructor.cpp:569-866) — for each
selected pose, spread w * ctf * dat (and w * ctf^2 into T) with trilinear
weights at the rotated padded coordinate rot @ (pf i, pf j, 0).

TPU design: accumulate into a **full centered complex grid** with one
deterministic scatter-add over precomputed linearized indices; Hermitian
symmetry is restored once at the end (F <- F + conj(flip F) on the
half-marked grid) instead of per-sample hemisphere folding.  XLA's
scatter-add is deterministic (no atomics), replacing the reference's
per-voxel omp atomics and the GPU backend's atomicAdd kernels
(gpu/src/Kernel.cu:2276-3203).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _trilinear_taps(x, y, z):
    """8 corner (iz, iy, ix, weight) taps for coordinates (..., )."""
    fx, fy, fz = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    wx, wy, wz = x - fx, y - fy, z - fz
    ix, iy, iz = fx.astype(jnp.int32), fy.astype(jnp.int32), fz.astype(jnp.int32)
    taps = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = (
                    (wz if dz else 1 - wz)
                    * (wy if dy else 1 - wy)
                    * (wx if dx else 1 - wx)
                )
                taps.append((iz + dz, iy + dy, ix + dx, w))
    return taps


def _bilinear_taps(x, y):
    fx, fy = jnp.floor(x), jnp.floor(y)
    wx, wy = x - fx, y - fy
    ix, iy = fx.astype(jnp.int32), fy.astype(jnp.int32)
    taps = []
    for dy in (0, 1):
        for dx in (0, 1):
            w = (wy if dy else 1 - wy) * (wx if dx else 1 - wx)
            taps.append((iy + dy, ix + dx, w))
    return taps


def insert_slices_3d(f_grid: jax.Array, t_grid: jax.Array,
                     vals: jax.Array, ctf2w: jax.Array,
                     rot: jax.Array, i_col: jax.Array, i_row: jax.Array,
                     pf: int, max_radius_pad: float) -> tuple[jax.Array, jax.Array]:
    """Scatter one batch of slices into (F, T).

    f_grid: (big, big, big) complex64 centered; t_grid same, float32.
    vals  : (..., p) complex  = w * ctf * translated data
    ctf2w : (..., p) float    = w * ctf^2
    rot   : (..., 3, 3); i_col/i_row: (p,) packed frequencies.

    Returns updated (f_grid, t_grid).  Out-of-radius taps get zero
    weight (the packing already restricts to max radius; the pad-grid
    radius check mirrors Reconstructor.cpp's QUAD < (maxRadius*pf)^2).
    """
    big = f_grid.shape[-1]
    c = big // 2
    fx = (i_col * pf).astype(jnp.float32)
    fy = (i_row * pf).astype(jnp.float32)
    x = rot[..., 0, 0:1] * fx + rot[..., 0, 1:2] * fy
    y = rot[..., 1, 0:1] * fx + rot[..., 1, 1:2] * fy
    z = rot[..., 2, 0:1] * fx + rot[..., 2, 1:2] * fy

    inside = (x * x + y * y + z * z) < max_radius_pad**2
    vals = jnp.where(inside, vals, 0.0)
    ctf2w = jnp.where(inside, ctf2w, 0.0)

    vr = jnp.real(vals).reshape(-1).astype(jnp.float32)
    vi = jnp.imag(vals).reshape(-1).astype(jnp.float32)
    wflat = ctf2w.reshape(-1).astype(jnp.float32)
    xf, yf, zf = x.reshape(-1), y.reshape(-1), z.reshape(-1)

    # one fused scatter-add: all 8 taps x {Re F, Im F, T} as (8N, 3)
    # float rows into a (big^3, 3) packed accumulator (24 separate
    # scatters cost ~3x more on TPU; scatter pays per update row)
    lins, upds = [], []
    for iz, iy, ix, w in _trilinear_taps(xf, yf, zf):
        xi = jnp.clip(ix + c, 0, big - 1)
        yi = jnp.clip(iy + c, 0, big - 1)
        zi = jnp.clip(iz + c, 0, big - 1)
        lins.append((zi * big + yi) * big + xi)
        w32 = w.astype(jnp.float32)
        upds.append(jnp.stack([vr * w32, vi * w32, wflat * w32], axis=-1))
    g = jnp.stack([jnp.real(f_grid).reshape(-1),
                   jnp.imag(f_grid).reshape(-1),
                   t_grid.reshape(-1)], axis=-1)
    g = g.at[jnp.concatenate(lins)].add(jnp.concatenate(upds))
    f_grid = jax.lax.complex(g[:, 0], g[:, 1]).reshape(big, big, big)
    return f_grid, g[:, 2].reshape(big, big, big)


def insert_slices_2d(f_grid: jax.Array, t_grid: jax.Array,
                     vals: jax.Array, ctf2w: jax.Array,
                     rot: jax.Array, i_col: jax.Array, i_row: jax.Array,
                     pf: int, max_radius_pad: float) -> tuple[jax.Array, jax.Array]:
    """2D insertion (class averages; Reconstructor.cpp 2D branches)."""
    big = f_grid.shape[-1]
    c = big // 2
    fx = (i_col * pf).astype(jnp.float32)
    fy = (i_row * pf).astype(jnp.float32)
    x = rot[..., 0, 0:1] * fx + rot[..., 0, 1:2] * fy
    y = rot[..., 1, 0:1] * fx + rot[..., 1, 1:2] * fy

    inside = (x * x + y * y) < max_radius_pad**2
    vals = jnp.where(inside, vals, 0.0)
    ctf2w = jnp.where(inside, ctf2w, 0.0)

    vr = jnp.real(vals).reshape(-1).astype(jnp.float32)
    vi = jnp.imag(vals).reshape(-1).astype(jnp.float32)
    wflat = ctf2w.reshape(-1).astype(jnp.float32)
    xf, yf = x.reshape(-1), y.reshape(-1)

    lins, upds = [], []
    for iy, ix, w in _bilinear_taps(xf, yf):
        xi = jnp.clip(ix + c, 0, big - 1)
        yi = jnp.clip(iy + c, 0, big - 1)
        lins.append(yi * big + xi)
        w32 = w.astype(jnp.float32)
        upds.append(jnp.stack([vr * w32, vi * w32, wflat * w32], axis=-1))
    g = jnp.stack([jnp.real(f_grid).reshape(-1),
                   jnp.imag(f_grid).reshape(-1),
                   t_grid.reshape(-1)], axis=-1)
    g = g.at[jnp.concatenate(lins)].add(jnp.concatenate(upds))
    f_grid = jax.lax.complex(g[:, 0], g[:, 1]).reshape(big, big)
    return f_grid, g[:, 2].reshape(big, big)


def hermitianize(f_grid: jax.Array) -> jax.Array:
    """F <- F + conj(F(-k)): completes the two-hemisphere insertion.

    Each packed pixel was inserted once (half-space packing); the
    physical spectrum needs its Hermitian mate too, and insertion is
    linear so the fold can happen once at the end.  For even grids the
    index -c has no mirror partner; roll keeps the map exact on the
    [-c, c) box by wrapping (those frequencies are outside max radius).
    """
    nd = f_grid.ndim
    axes = tuple(range(nd))
    flipped = jnp.flip(f_grid, axis=axes)
    # flip maps index c+k -> big-1-(c+k) = c + (big-1-2c-k); for even big
    # (big = 2c) this is c + (-1 - k): a half-step offset — roll by 1
    # realigns -k to its slot.
    flipped = jnp.roll(flipped, shift=(1,) * nd, axis=axes)
    return f_grid + jnp.conj(flipped)


def hermitianize_real(t_grid: jax.Array) -> jax.Array:
    nd = t_grid.ndim
    axes = tuple(range(nd))
    flipped = jnp.roll(jnp.flip(t_grid, axis=axes), shift=(1,) * nd, axis=axes)
    return t_grid + flipped
