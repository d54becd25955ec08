"""Fourier-slice projection.

Replaces the reference Projector (src/Projector.cpp): pad the reference
by ``pf`` in real space, divide by the interpolation kernel's FT
(grid correction, Projector.cpp:524-606), FFT once; per pose, gather a
central slice (3D) or line-rotated plane (2D) by linear interpolation at
rotated padded coordinates (Projector.cpp:337-374).

TPU design: the padded spectrum is a **full complex cube/plane in
centered layout**, so slice extraction is a pure batched trilinear
gather with no hemisphere branching (the conjugate half is physically
present).  Projection cost is amortized: in global search the same
rotation grid serves every image and translation, and the downstream
likelihood matmul dominates FLOPs, so XLA's gather is sufficient here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from thunder_tpu.ops.fourier import (
    fft2_centered,
    fft3_centered,
    pad_rl,
    radial_grid_dev,
)
from thunder_tpu.physics.kernels import tik_rl, nik_rl
from thunder_tpu.ops.fourier import PackedRings


class Projectee(NamedTuple):
    """A prepared, padded, grid-corrected reference spectrum."""

    ft: jax.Array      # (pf*size,)*ndim complex64, centered layout
    size: int          # original box size
    pf: int
    max_radius: int    # floor(size/2 - 1)


def prepare_projectee_2d(ref_rl: jax.Array, pf: int = 2,
                         interp: str = "linear") -> Projectee:
    """Real-space 2D reference (FFT layout) -> padded corrected spectrum
    (Projector.cpp:97-121)."""
    size = ref_rl.shape[-1]
    padded = pad_rl(ref_rl, pf)
    big = size * pf
    r = radial_grid_dev(big, 2) / (pf * big)
    corr = tik_rl(r) if interp == "linear" else nik_rl(r)
    padded = padded / corr
    return Projectee(fft2_centered(padded).astype(jnp.complex64), size, pf,
                     size // 2 - 1)


def prepare_projectee_3d(ref_rl: jax.Array, pf: int = 2,
                         interp: str = "linear") -> Projectee:
    """Real-space 3D reference (FFT layout) -> padded corrected spectrum
    (Projector.cpp:123-148).  Note the correction divisor's argument is
    r / (pf * padded_size), matching Projector.cpp:578-580."""
    size = ref_rl.shape[-1]
    padded = pad_rl(ref_rl, pf)
    big = size * pf
    r = radial_grid_dev(big, 3) / (pf * big)
    corr = tik_rl(r) if interp == "linear" else nik_rl(r)
    padded = padded / corr
    return Projectee(fft3_centered(padded).astype(jnp.complex64), size, pf,
                     size // 2 - 1)


def _zoom_dft_mat(size: int, big: int, crop: int) -> jax.Array:
    """Per-axis zoom-DFT matrix E[K, m] = exp(-2pi i (K - bc)(m - c)/big)
    taking the centered real-space support (``size`` samples of the
    pf-padded box) directly to the centered-spectrum band
    [bc - crop//2, bc - crop//2 + crop).  Equals the corresponding rows
    of the padded FFT: fft3_centered(pad_rl(x))[K] = sum_m xc[m] E[K,m]
    (fftshift/pad_rl phase conventions cancel, see fourier.py)."""
    kk = jnp.arange(crop, dtype=jnp.float32) - crop // 2      # K - bc
    mm = jnp.arange(size, dtype=jnp.float32) - size // 2      # m - c
    ang = (-2.0 * jnp.pi / big) * kk[:, None] * mm[None, :]
    return jax.lax.complex(jnp.cos(ang), jnp.sin(ang))


def prepare_projectee_3d_cropped(ref_rl: jax.Array, pf: int, crop: int,
                                 interp: str = "linear") -> jax.Array:
    """Padded + grid-corrected spectrum, central ``crop`` band only,
    WITHOUT materialising the (pf*size)^3 cube: the padded FFT restricted
    to the reachable band is three per-axis zoom-DFT matmuls over the
    real-space support (Bluestein-style band evaluation, MXU-friendly).

    At 256px/pf=2 the full-cube path computes a 512^3 FFT (1 GiB
    intermediate per class) and keeps <1% of it; this computes the
    ~132^3 band directly.  Matches prepare_projectee_3d(...).ft's
    central crop to float32 accuracy (test_projector.py)."""
    size = ref_rl.shape[-1]
    big = size * pf
    from thunder_tpu.ops.fourier import centered_quad_dev

    rc = jnp.fft.fftshift(ref_rl, axes=(-3, -2, -1))
    r = jnp.sqrt(centered_quad_dev(size, 3)) / (pf * big)
    corr = tik_rl(r) if interp == "linear" else nik_rl(r)
    rc = (rc / corr).astype(jnp.complex64)
    e = _zoom_dft_mat(size, big, crop)
    hi = jax.lax.Precision.HIGHEST
    t = jnp.einsum("Km,zym->zyK", e, rc, precision=hi)
    t = jnp.einsum("Jm,zmK->zJK", e, t, precision=hi)
    t = jnp.einsum("Im,mJK->IJK", e, t, precision=hi)
    return t.astype(jnp.complex64)


def _flat_ok(arr) -> bool:
    """True when the array can be addressed by a single int32 linear
    index — the precondition for the fast flattened-take gather path
    (multi-dim advanced indexing lowers to a slower TPU gather path;
    measured in scripts/micro_gather.py)."""
    n = 1
    for d in arr.shape:
        n *= d
    return n < 2**31


def _gather_trilinear_3d(vol: jax.Array, x: jax.Array, y: jax.Array,
                         z: jax.Array) -> jax.Array:
    """Trilinear interpolation of a centered cube at real-valued
    centered coordinates (any broadcastable shape)."""
    big = vol.shape[-1]
    c = big // 2
    fx = jnp.floor(x)
    fy = jnp.floor(y)
    fz = jnp.floor(z)
    wx = (x - fx).astype(jnp.float32)
    wy = (y - fy).astype(jnp.float32)
    wz = (z - fz).astype(jnp.float32)
    ix = fx.astype(jnp.int32) + c
    iy = fy.astype(jnp.int32) + c
    iz = fz.astype(jnp.int32) + c
    use_flat = _flat_ok(vol)
    flat = vol.reshape(-1) if use_flat else None

    def tap(dz, dy, dx, w):
        xi = jnp.clip(ix + dx, 0, big - 1)
        yi = jnp.clip(iy + dy, 0, big - 1)
        zi = jnp.clip(iz + dz, 0, big - 1)
        if use_flat:
            lin = (zi * big + yi) * big + xi
            return jnp.take(flat, lin, axis=0) * w.astype(vol.dtype)
        return vol[zi, yi, xi] * w.astype(vol.dtype)

    out = tap(0, 0, 0, (1 - wz) * (1 - wy) * (1 - wx))
    out += tap(0, 0, 1, (1 - wz) * (1 - wy) * wx)
    out += tap(0, 1, 0, (1 - wz) * wy * (1 - wx))
    out += tap(0, 1, 1, (1 - wz) * wy * wx)
    out += tap(1, 0, 0, wz * (1 - wy) * (1 - wx))
    out += tap(1, 0, 1, wz * (1 - wy) * wx)
    out += tap(1, 1, 0, wz * wy * (1 - wx))
    out += tap(1, 1, 1, wz * wy * wx)
    return out


def _gather_bilinear_2d(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    big = img.shape[-1]
    c = big // 2
    fx = jnp.floor(x)
    fy = jnp.floor(y)
    wx = (x - fx).astype(jnp.float32)
    wy = (y - fy).astype(jnp.float32)
    ix = fx.astype(jnp.int32) + c
    iy = fy.astype(jnp.int32) + c

    use_flat = _flat_ok(img)
    flat = img.reshape(-1) if use_flat else None

    def tap(dy, dx, w):
        xi = jnp.clip(ix + dx, 0, big - 1)
        yi = jnp.clip(iy + dy, 0, big - 1)
        if use_flat:
            return jnp.take(flat, yi * big + xi, axis=0) * w.astype(img.dtype)
        return img[yi, xi] * w.astype(img.dtype)

    return (
        tap(0, 0, (1 - wy) * (1 - wx))
        + tap(0, 1, (1 - wy) * wx)
        + tap(1, 0, wy * (1 - wx))
        + tap(1, 1, wy * wx)
    )


def _gather_trilinear_3d_stack(vols: jax.Array, vol_idx: jax.Array,
                               x: jax.Array, y: jax.Array,
                               z: jax.Array) -> jax.Array:
    """Trilinear gather from a stack of cubes (K, big, big, big) where
    each leading-batch row selects its own cube via vol_idx (L,).

    x/y/z: (L, ...) centered coordinates.  One gather instead of K —
    the classification hot path projects only each image's own class.
    """
    big = vols.shape[-1]
    c = big // 2
    fx, fy, fz = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    wx = (x - fx).astype(jnp.float32)
    wy = (y - fy).astype(jnp.float32)
    wz = (z - fz).astype(jnp.float32)
    ix = fx.astype(jnp.int32) + c
    iy = fy.astype(jnp.int32) + c
    iz = fz.astype(jnp.int32) + c
    vi = vol_idx.reshape(vol_idx.shape + (1,) * (x.ndim - 1))
    use_flat = _flat_ok(vols)
    flat = vols.reshape(-1) if use_flat else None

    def tap(dz, dy, dx, w):
        xi = jnp.clip(ix + dx, 0, big - 1)
        yi = jnp.clip(iy + dy, 0, big - 1)
        zi = jnp.clip(iz + dz, 0, big - 1)
        if use_flat:
            lin = ((vi * big + zi) * big + yi) * big + xi
            return jnp.take(flat, lin, axis=0) * w.astype(vols.dtype)
        return vols[vi, zi, yi, xi] * w.astype(vols.dtype)

    out = tap(0, 0, 0, (1 - wz) * (1 - wy) * (1 - wx))
    out += tap(0, 0, 1, (1 - wz) * (1 - wy) * wx)
    out += tap(0, 1, 0, (1 - wz) * wy * (1 - wx))
    out += tap(0, 1, 1, (1 - wz) * wy * wx)
    out += tap(1, 0, 0, wz * (1 - wy) * (1 - wx))
    out += tap(1, 0, 1, wz * (1 - wy) * wx)
    out += tap(1, 1, 0, wz * wy * (1 - wx))
    out += tap(1, 1, 1, wz * wy * wx)
    return out


def _gather_bilinear_2d_stack(imgs: jax.Array, img_idx: jax.Array,
                              x: jax.Array, y: jax.Array) -> jax.Array:
    big = imgs.shape[-1]
    c = big // 2
    fx, fy = jnp.floor(x), jnp.floor(y)
    wx = (x - fx).astype(jnp.float32)
    wy = (y - fy).astype(jnp.float32)
    ix = fx.astype(jnp.int32) + c
    iy = fy.astype(jnp.int32) + c
    vi = img_idx.reshape(img_idx.shape + (1,) * (x.ndim - 1))
    use_flat = _flat_ok(imgs)
    flat = imgs.reshape(-1) if use_flat else None

    def tap(dy, dx, w):
        xi = jnp.clip(ix + dx, 0, big - 1)
        yi = jnp.clip(iy + dy, 0, big - 1)
        if use_flat:
            lin = (vi * big + yi) * big + xi
            return jnp.take(flat, lin, axis=0) * w.astype(imgs.dtype)
        return imgs[vi, yi, xi] * w.astype(imgs.dtype)

    return (
        tap(0, 0, (1 - wy) * (1 - wx))
        + tap(0, 1, (1 - wy) * wx)
        + tap(1, 0, wy * (1 - wx))
        + tap(1, 1, wy * wx)
    )


def ri_split(proj_stack: jax.Array, pack_bf16: bool = True) -> jax.Array:
    """(K, big, ...) complex spectra -> gather-friendly storage.

    TPU gather cost is proportional to gathered bytes (measured in
    scripts/micro_gather.py), so the hot projector gathers avoid the
    complex dtype.  pack_bf16=True (default): each (re, im) pair is
    stored as two bfloat16 halves of ONE uint32 word, shape (K, big,
    ...) — 8 taps x 4 bytes, ~1.9x faster than split float32 and
    comparable precision to the reference's CUDA texture path (whose
    hardware trilinear uses 8-bit fractional weights,
    gpu/src/Kernel.cu texture fetches).  pack_bf16=False: float32
    split, shape (K, 2, big, ...), for full-precision projection.
    project_classed / project_ri dispatch on the dtype."""
    re = jnp.real(proj_stack)
    im = jnp.imag(proj_stack)
    if not pack_bf16:
        return jnp.stack([re, im], axis=1).astype(jnp.float32)
    lo = jax.lax.bitcast_convert_type(
        re.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        im.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    return lo | (hi << 16)


def oct_pack(packed: jax.Array, mode_2d: bool) -> jax.Array:
    """uint32 ri-word spectra (K, big, ...) -> corner-row tables.

    TPU gather throughput is per-ROW, nearly flat in row width up to 8
    words (measured: 8-wide rows cost ~1.2x a 1-wide take but deliver
    8 taps) — so store, for every voxel, ALL 2x2(x2) interpolation
    corners as one contiguous row.  One take then serves a whole
    trilinear/bilinear stencil: ~10x faster than 8 scalar takes at
    production shapes.  This is the TPU analogue of the reference's
    CUDA texture fetches (gpu/src/Kernel.cu projection kernels), which
    get the 8-tap stencil from texture hardware.

    Returns (K, big, ..., 8) uint32 for 3D (corner order dz,dy,dx
    binary) or (K, big, big, 4) for 2D (dy,dx binary).  Memory: 8x/4x
    the packed spectrum — the caller gates on table size.
    """
    k = packed.shape[0]
    big = packed.shape[-1]
    if mode_2d:
        pad = jnp.pad(packed, ((0, 0), (0, 1), (0, 1)))
        rows = jnp.stack(
            [pad[:, dy:dy + big, dx:dx + big]
             for dy in (0, 1) for dx in (0, 1)], axis=-1)
    else:
        pad = jnp.pad(packed, ((0, 0), (0, 1), (0, 1), (0, 1)))
        rows = jnp.stack(
            [pad[:, dz:dz + big, dy:dy + big, dx:dx + big]
             for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)], axis=-1)
    return rows


def oct_pack_half(packed: jax.Array, mode_2d: bool) -> jax.Array:
    """Hermitian half-space corner-row tables: kx >= 0 only.

    The reference stores only the r2c half-space and folds the
    conjugate on access (Image.h:111, Volume.h:393-480 getFTHalf); the
    TPU analogue keeps the branch-free corner-row gather but halves
    table bytes: only x-planes kx in [0, c) are stored, and the gather
    folds (x,y,z) -> (-x,-y,-z) with a sign flip on im for kx < 0
    samples (see _fold_half).  Returns (K, big, [big,] c, 4|8) uint32,
    where c = big // 2 (the x axis is indexed by kx directly, not
    c + kx).
    """
    rows = oct_pack(packed, mode_2d)
    c = packed.shape[-1] // 2
    return rows[..., c:, :]


def _fold_half(x, y, z=None):
    """Hermitian fold: samples with x < 0 negate all coordinates (their
    value is the conjugate of the mirrored sample).  Returns folded
    coords + the im-sign (+1 / -1) float32."""
    neg = x < 0.0
    sgn = jnp.where(neg, -1.0, 1.0).astype(jnp.float32)
    xs = x * sgn
    ys = y * sgn
    if z is None:
        return xs, ys, sgn
    return xs, ys, z * sgn, sgn


def _gather_oct_trilinear_half(rows_flat: jax.Array, vi, x, y, z,
                               big: int) -> jax.Array:
    """Half-space variant of _gather_oct_trilinear: one row-take per
    stencil from the kx >= 0 table + conjugate fold (getFTHalf
    semantics, Volume.h:442-480).  rows_flat: (K*big*big*c, 8)."""
    cx = big // 2
    c = big // 2
    xs, ys, zs, sgn = _fold_half(x, y, z)
    fx, fy, fz = jnp.floor(xs), jnp.floor(ys), jnp.floor(zs)
    wx = (xs - fx).astype(jnp.float32)
    wy = (ys - fy).astype(jnp.float32)
    wz = (zs - fz).astype(jnp.float32)
    ix = jnp.clip(fx.astype(jnp.int32), 0, cx - 1)
    iy = jnp.clip(fy.astype(jnp.int32) + c, 0, big - 1)
    iz = jnp.clip(fz.astype(jnp.int32) + c, 0, big - 1)
    lin = vi + (iz * big + iy) * cx + ix
    taps = jnp.take(rows_flat, lin, axis=0)              # (..., 8)
    re, im = _unpack_ri(taps)
    wzs = jnp.stack([1 - wz, wz], axis=-1)
    wys = jnp.stack([1 - wy, wy], axis=-1)
    wxs = jnp.stack([1 - wx, wx], axis=-1)
    w = (wzs[..., :, None, None] * wys[..., None, :, None]
         * wxs[..., None, None, :]).reshape(wx.shape + (8,))
    return jax.lax.complex(jnp.sum(re * w, axis=-1),
                           jnp.sum(im * w, axis=-1) * sgn)


def _gather_quad_bilinear_half(rows_flat: jax.Array, vi, x, y,
                               big: int) -> jax.Array:
    """Half-space variant of _gather_quad_bilinear (2D conjugate fold).
    rows_flat: (K*big*c, 4)."""
    cx = big // 2
    c = big // 2
    xs, ys, sgn = _fold_half(x, y)
    fx, fy = jnp.floor(xs), jnp.floor(ys)
    wx = (xs - fx).astype(jnp.float32)
    wy = (ys - fy).astype(jnp.float32)
    ix = jnp.clip(fx.astype(jnp.int32), 0, cx - 1)
    iy = jnp.clip(fy.astype(jnp.int32) + c, 0, big - 1)
    lin = vi + iy * cx + ix
    taps = jnp.take(rows_flat, lin, axis=0)              # (..., 4)
    re, im = _unpack_ri(taps)
    wys = jnp.stack([1 - wy, wy], axis=-1)
    wxs = jnp.stack([1 - wx, wx], axis=-1)
    w = (wys[..., :, None] * wxs[..., None, :]).reshape(wx.shape + (4,))
    return jax.lax.complex(jnp.sum(re * w, axis=-1),
                           jnp.sum(im * w, axis=-1) * sgn)


def _gather_oct_trilinear(rows_flat: jax.Array, vi, ix, iy, iz, wx, wy, wz,
                          big: int) -> jax.Array:
    """One row-take of all 8 packed corners + trilinear combine.
    rows_flat: (n_vox, 8) uint32 (see oct_pack); vi = volume offset."""
    ix = jnp.clip(ix, 0, big - 1)
    iy = jnp.clip(iy, 0, big - 1)
    iz = jnp.clip(iz, 0, big - 1)
    lin = vi + (iz * big + iy) * big + ix
    taps = jnp.take(rows_flat, lin, axis=0)              # (..., 8)
    re, im = _unpack_ri(taps)
    wzs = jnp.stack([1 - wz, wz], axis=-1)               # (..., 2)
    wys = jnp.stack([1 - wy, wy], axis=-1)
    wxs = jnp.stack([1 - wx, wx], axis=-1)
    w = (wzs[..., :, None, None] * wys[..., None, :, None]
         * wxs[..., None, None, :]).reshape(wx.shape + (8,))
    return jax.lax.complex(jnp.sum(re * w, axis=-1), jnp.sum(im * w, axis=-1))


def _gather_quad_bilinear(rows_flat: jax.Array, vi, ix, iy, wx, wy,
                          big: int) -> jax.Array:
    """One row-take of all 4 packed corners + bilinear combine."""
    ix = jnp.clip(ix, 0, big - 1)
    iy = jnp.clip(iy, 0, big - 1)
    lin = vi + iy * big + ix
    taps = jnp.take(rows_flat, lin, axis=0)              # (..., 4)
    re, im = _unpack_ri(taps)
    wys = jnp.stack([1 - wy, wy], axis=-1)
    wxs = jnp.stack([1 - wx, wx], axis=-1)
    w = (wys[..., :, None] * wxs[..., None, :]).reshape(wx.shape + (4,))
    return jax.lax.complex(jnp.sum(re * w, axis=-1), jnp.sum(im * w, axis=-1))


def _unpack_ri(word: jax.Array) -> tuple[jax.Array, jax.Array]:
    """uint32 word -> (re, im) float32 (inverse of ri_split packing)."""
    re = jax.lax.bitcast_convert_type(
        (word & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
    im = jax.lax.bitcast_convert_type(
        (word >> 16).astype(jnp.uint16), jnp.bfloat16)
    return re.astype(jnp.float32), im.astype(jnp.float32)


def _gather_packed_trilinear(flat: jax.Array, vi, ix, iy, iz, wx, wy, wz,
                             big: int) -> jax.Array:
    """8-tap trilinear gather of packed uint32 ri-words from a flattened
    stack; vi is a broadcastable volume offset (already * big^3) or 0."""
    outr = 0.0
    outi = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = ((wz if dz else 1 - wz) * (wy if dy else 1 - wy)
                     * (wx if dx else 1 - wx))
                xi = jnp.clip(ix + dx, 0, big - 1)
                yi = jnp.clip(iy + dy, 0, big - 1)
                zi = jnp.clip(iz + dz, 0, big - 1)
                lin = vi + (zi * big + yi) * big + xi
                re, im = _unpack_ri(jnp.take(flat, lin, axis=0))
                outr += re * w
                outi += im * w
    return jax.lax.complex(outr, outi)


def _gather_packed_bilinear(flat: jax.Array, vi, ix, iy, wx, wy,
                            big: int) -> jax.Array:
    outr = 0.0
    outi = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            w = (wy if dy else 1 - wy) * (wx if dx else 1 - wx)
            xi = jnp.clip(ix + dx, 0, big - 1)
            yi = jnp.clip(iy + dy, 0, big - 1)
            re, im = _unpack_ri(jnp.take(flat, vi + yi * big + xi, axis=0))
            outr += re * w
            outi += im * w
    return jax.lax.complex(outr, outi)


def _corners(x, y, big):
    fx, fy = jnp.floor(x), jnp.floor(y)
    c = big // 2
    return (fx.astype(jnp.int32) + c, fy.astype(jnp.int32) + c,
            (x - fx).astype(jnp.float32), (y - fy).astype(jnp.float32))


def project_classed(proj_stack_ri: jax.Array, cls: jax.Array, rot: jax.Array,
                    rings, pf: int, mode_2d: bool) -> jax.Array:
    """Project per-image rotations from each image's own class spectrum.

    proj_stack_ri: (K, 2, big, ...) ri-split spectra (see ri_split);
    cls: (L,); rot: (L, R, d, d); returns (L, R, p) complex slices.
    """
    fx = (rings.i_col * pf).astype(jnp.float32)
    fy = (rings.i_row * pf).astype(jnp.float32)
    x = rot[..., 0, 0:1] * fx + rot[..., 0, 1:2] * fy
    y = rot[..., 1, 0:1] * fx + rot[..., 1, 1:2] * fy
    k_cls = proj_stack_ri.shape[0]
    packed = proj_stack_ri.dtype == jnp.uint32
    if packed and proj_stack_ri.ndim == (4 if mode_2d else 5):
        # corner-row table (see oct_pack / oct_pack_half): one take per
        # stencil; the Hermitian half table is detected by its halved
        # x axis
        big = proj_stack_ri.shape[-3]
        half = proj_stack_ri.shape[-2] * 2 == big
        if not half:
            big = proj_stack_ri.shape[-2]
        nd = proj_stack_ri.ndim - 2
        w_row = proj_stack_ri.shape[-1]
        rows = proj_stack_ri.reshape(-1, w_row)
        n_vox = 1
        for d in proj_stack_ri.shape[1:-1]:
            n_vox *= d
        vi = (cls * n_vox).reshape(cls.shape + (1,) * (x.ndim - 1))
        if half:
            if mode_2d:
                return _gather_quad_bilinear_half(rows, vi, x, y, big)
            z = rot[..., 2, 0:1] * fx + rot[..., 2, 1:2] * fy
            return _gather_oct_trilinear_half(rows, vi, x, y, z, big)
        ix, iy, wx, wy = _corners(x, y, big)
        if mode_2d:
            return _gather_quad_bilinear(rows, vi, ix, iy, wx, wy, big)
        z = rot[..., 2, 0:1] * fx + rot[..., 2, 1:2] * fy
        iz, _, wz, _ = _corners(z, z, big)
        return _gather_oct_trilinear(rows, vi, ix, iy, iz, wx, wy, wz, big)
    if packed:
        big = proj_stack_ri.shape[-1]
        nd = proj_stack_ri.ndim - 1
        flat = proj_stack_ri.reshape(-1)
        vi = (cls * big**nd).reshape(cls.shape + (1,) * (x.ndim - 1))
        ix, iy, wx, wy = _corners(x, y, big)
        if mode_2d:
            return _gather_packed_bilinear(flat, vi, ix, iy, wx, wy, big)
        z = rot[..., 2, 0:1] * fx + rot[..., 2, 1:2] * fy
        iz, _, wz, _ = _corners(z, z, big)
        return _gather_packed_trilinear(flat, vi, ix, iy, iz, wx, wy, wz, big)
    if mode_2d:
        flat = proj_stack_ri.reshape((k_cls * 2,) + proj_stack_ri.shape[2:])
        re = _gather_bilinear_2d_stack(flat, cls * 2, x, y)
        im = _gather_bilinear_2d_stack(flat, cls * 2 + 1, x, y)
        return jax.lax.complex(re, im)
    z = rot[..., 2, 0:1] * fx + rot[..., 2, 1:2] * fy
    flat = proj_stack_ri.reshape((k_cls * 2,) + proj_stack_ri.shape[2:])
    re = _gather_trilinear_3d_stack(flat, cls * 2, x, y, z)
    im = _gather_trilinear_3d_stack(flat, cls * 2 + 1, x, y, z)
    return jax.lax.complex(re, im)


def project_ri(proj_ri: jax.Array, rot: jax.Array, rings, pf: int,
               mode_2d: bool) -> jax.Array:
    """Slice extraction from ONE ri-split spectrum (2, big, ...): the
    float-gather fast path for the scanned global search."""
    fx = (rings.i_col * pf).astype(jnp.float32)
    fy = (rings.i_row * pf).astype(jnp.float32)
    x = rot[..., 0, 0:1] * fx + rot[..., 0, 1:2] * fy
    y = rot[..., 1, 0:1] * fx + rot[..., 1, 1:2] * fy
    if proj_ri.dtype == jnp.uint32 and proj_ri.ndim == (3 if mode_2d else 4):
        # corner-row table for one class (see oct_pack / oct_pack_half)
        big = proj_ri.shape[-3]
        half = proj_ri.shape[-2] * 2 == big
        if not half:
            big = proj_ri.shape[-2]
        rows = proj_ri.reshape(-1, proj_ri.shape[-1])
        if half:
            if mode_2d:
                return _gather_quad_bilinear_half(rows, 0, x, y, big)
            z = rot[..., 2, 0:1] * fx + rot[..., 2, 1:2] * fy
            return _gather_oct_trilinear_half(rows, 0, x, y, z, big)
        ix, iy, wx, wy = _corners(x, y, big)
        if mode_2d:
            return _gather_quad_bilinear(rows, 0, ix, iy, wx, wy, big)
        z = rot[..., 2, 0:1] * fx + rot[..., 2, 1:2] * fy
        iz, _, wz, _ = _corners(z, z, big)
        return _gather_oct_trilinear(rows, 0, ix, iy, iz, wx, wy, wz, big)
    if proj_ri.dtype == jnp.uint32:
        big = proj_ri.shape[-1]
        flat = proj_ri.reshape(-1)
        ix, iy, wx, wy = _corners(x, y, big)
        if mode_2d:
            return _gather_packed_bilinear(flat, 0, ix, iy, wx, wy, big)
        z = rot[..., 2, 0:1] * fx + rot[..., 2, 1:2] * fy
        iz, _, wz, _ = _corners(z, z, big)
        return _gather_packed_trilinear(flat, 0, ix, iy, iz, wx, wy, wz, big)
    if mode_2d:
        re = _gather_bilinear_2d(proj_ri[0], x, y)
        im = _gather_bilinear_2d(proj_ri[1], x, y)
        return jax.lax.complex(re, im)
    z = rot[..., 2, 0:1] * fx + rot[..., 2, 1:2] * fy
    re = _gather_trilinear_3d(proj_ri[0], x, y, z)
    im = _gather_trilinear_3d(proj_ri[1], x, y, z)
    return jax.lax.complex(re, im)


def project_3d(proj: Projectee, rot: jax.Array, rings: PackedRings) -> jax.Array:
    """Extract central slices at packed pixels for a batch of rotations.

    rot: (..., 3, 3); returns (..., p) complex64 slice values at the
    coordinates rot @ (pf*i, pf*j, 0) (Projector.cpp:356-374).
    """
    pf = proj.pf
    fx = (rings.i_col * pf).astype(jnp.float32)
    fy = (rings.i_row * pf).astype(jnp.float32)
    # old = R @ (fx, fy, 0): only the first two columns of R matter
    x = rot[..., 0, 0:1] * fx + rot[..., 0, 1:2] * fy
    y = rot[..., 1, 0:1] * fx + rot[..., 1, 1:2] * fy
    z = rot[..., 2, 0:1] * fx + rot[..., 2, 1:2] * fy
    return _gather_trilinear_3d(proj.ft, x, y, z)


def project_2d(proj: Projectee, rot: jax.Array, rings: PackedRings) -> jax.Array:
    """2D in-plane rotated resampling at packed pixels.

    rot: (..., 2, 2); returns (..., p) complex64.
    """
    pf = proj.pf
    fx = (rings.i_col * pf).astype(jnp.float32)
    fy = (rings.i_row * pf).astype(jnp.float32)
    x = rot[..., 0, 0:1] * fx + rot[..., 0, 1:2] * fy
    y = rot[..., 1, 0:1] * fx + rot[..., 1, 1:2] * fy
    return _gather_bilinear_2d(proj.ft, x, y)


def project_full_2d(proj: Projectee, rot: jax.Array) -> jax.Array:
    """Project to a full centered spectrum (size x size), radius-limited
    (Projector.cpp:257-294's whole-image variant); for tools/tests."""
    size = proj.size
    c = size // 2
    k = jnp.arange(size, dtype=jnp.float32) - c
    ky, kx = jnp.meshgrid(k, k, indexing="ij")
    inside = kx * kx + ky * ky < proj.max_radius**2
    pf = proj.pf
    x = rot[..., 0, 0, None, None] * kx * pf + rot[..., 0, 1, None, None] * ky * pf
    y = rot[..., 1, 0, None, None] * kx * pf + rot[..., 1, 1, None, None] * ky * pf
    vals = _gather_bilinear_2d(proj.ft, x, y)
    return jnp.where(inside, vals, 0.0)


def project_full_3d(proj: Projectee, rot: jax.Array) -> jax.Array:
    """Central-slice projection to a full centered 2D spectrum."""
    size = proj.size
    c = size // 2
    k = jnp.arange(size, dtype=jnp.float32) - c
    ky, kx = jnp.meshgrid(k, k, indexing="ij")
    inside = kx * kx + ky * ky < proj.max_radius**2
    pf = proj.pf
    x = rot[..., 0, 0, None, None] * kx * pf + rot[..., 0, 1, None, None] * ky * pf
    y = rot[..., 1, 0, None, None] * kx * pf + rot[..., 1, 1, None, None] * ky * pf
    z = rot[..., 2, 0, None, None] * kx * pf + rot[..., 2, 1, None, None] * ky * pf
    vals = _gather_trilinear_3d(proj.ft, x, y, z)
    return jnp.where(inside, vals, 0.0)
