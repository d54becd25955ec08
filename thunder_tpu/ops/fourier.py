"""Fourier layout helpers: centered transforms, real-space padding,
packed pixel rings and translation phase ramps.

Layout contract (see io/mrc.py):
  * real space: FFT layout, particle center at index [0, 0];
  * Fourier space: **centered full-space**, index [c + ky, c + kx]
    (and [c + kz, ...] for volumes), c = size // 2.

``fft*_centered`` therefore wrap plain fft with a final fftshift; since
real-space input is already in FFT layout, the resulting coefficients
are true centered-origin FTs with no checkerboard phase — the property
that makes Fourier-slice interpolation possible (the reference gets this
from MESH_IMAGE_INDEX remapping on load, include/Image/ImageFile.h:383).

The packed pixel ring replaces the reference's allocPreCalIdx
(Optimiser.cpp:7991-8042): all half-space integer frequencies with
r_l <= round(|f|) < r_u, padded to a multiple of 128 lanes with a
validity mask so downstream matmuls stay tile-aligned.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


# -- device-side coordinate grids ---------------------------------------
# (iota-based: computed inside the compiled program instead of being
# embedded as multi-hundred-MB array constants at big box sizes)


def radial_grid_dev(size: int, ndim: int) -> jax.Array:
    """Wrapped (FFT-layout) distance-from-origin grid, on device."""
    k = jnp.arange(size, dtype=jnp.float32)
    k = jnp.minimum(k, size - k)
    q = 0.0
    for d in range(ndim):
        shape = [1] * ndim
        shape[d] = size
        q = q + (k.reshape(shape)) ** 2
    return jnp.sqrt(q)


def centered_quad_dev(size: int, ndim: int) -> jax.Array:
    """|k|^2 over the centered grid, on device."""
    c = size // 2
    k = jnp.arange(size, dtype=jnp.float32) - c
    q = 0.0
    for d in range(ndim):
        shape = [1] * ndim
        shape[d] = size
        q = q + (k.reshape(shape)) ** 2
    return q


def centered_shell_dev(size: int, ndim: int) -> jax.Array:
    """round(|k|) integer shell index over the centered grid, on device."""
    return jnp.rint(jnp.sqrt(centered_quad_dev(size, ndim))).astype(jnp.int32)


# -- centered transforms ------------------------------------------------

def fft2_centered(x: jax.Array) -> jax.Array:
    """Real space (FFT layout) -> centered full-space spectrum."""
    return jnp.fft.fftshift(jnp.fft.fft2(x), axes=(-2, -1))


def ifft2_centered(f: jax.Array) -> jax.Array:
    """Centered spectrum -> real space (FFT layout); returns the real part."""
    return jnp.real(jnp.fft.ifft2(jnp.fft.ifftshift(f, axes=(-2, -1))))


def fft3_centered(x: jax.Array) -> jax.Array:
    return jnp.fft.fftshift(jnp.fft.fftn(x, axes=(-3, -2, -1)), axes=(-3, -2, -1))


def ifft3_centered(f: jax.Array) -> jax.Array:
    return jnp.real(
        jnp.fft.ifftn(jnp.fft.ifftshift(f, axes=(-3, -2, -1)), axes=(-3, -2, -1))
    )


def irfftn_safe(h: jax.Array, s, axes) -> jax.Array:
    """3D inverse real FFT decomposed into per-axis transforms.

    The TPU's fused 3D ``irfftn`` returns WRONG VALUES at certain cube
    sizes — measured on hardware: 256/272/288/336/348/352/384 give
    ~O(1) absolute error on unit-normal data (essentially every element
    wrong) while 240 and below, 292, 304 and 320 are exact to 2e-6.
    The forward ``rfftn``, the complex ``fftn``/``ifftn``, and every 2D
    transform are correct at all tested sizes, so only this inverse is
    decomposed: two complex ``ifft`` passes + one ``irfft`` pass,
    identical math, correct everywhere, same FLOP count.  2D inputs
    pass through to the stock ``irfftn``."""
    if len(axes) < 3:
        return jnp.fft.irfftn(h, s=s, axes=axes)
    y = jnp.fft.ifft(h, axis=axes[0])
    y = jnp.fft.ifft(y, axis=axes[1])
    return jnp.fft.irfft(y, n=s[axes[2]], axis=axes[2])


# -- real-space pad / extract ------------------------------------------

def pad_rl(x: jax.Array, pf: int) -> jax.Array:
    """Zero-pad a real-space FFT-layout array by factor ``pf`` around the
    centered object (IMG_PAD_RL / VOL_PAD_RL analogue)."""
    if pf == 1:
        return x
    nd = x.ndim  # spatial-only input: (size, size) or (size, size, size)
    size = x.shape[-1]
    big = size * pf
    lo = (big - size) // 2
    pad_width = [(lo, big - size - lo)] * nd
    centered = jnp.fft.fftshift(x, axes=tuple(range(nd)))
    padded = jnp.pad(centered, pad_width)
    return jnp.fft.ifftshift(padded, axes=tuple(range(nd)))


def resize_rl(x: jax.Array, new_size: int,
              preserve: str = "coefficients") -> jax.Array:
    """Fourier resample an FFT-layout real array to a new box size
    (centered spectrum crop/pad).

    preserve="coefficients": the DFT coefficients are kept — projecting
    or re-FFT-ing the result reproduces the same Fourier samples.  This
    is the convention for growing cropped-grid reconstructions back to
    the full box (Model::resetReco keeps size_r maps whose DFT matches
    the insertion grid, Model.cpp:1100-1130).
    preserve="values": real-space sample values are kept (what a user
    expects from a volume-resize tool).
    """
    nd = x.ndim
    size = x.shape[-1]
    if new_size == size:
        return x
    axes = tuple(range(nd))
    ft = jnp.fft.fftshift(jnp.fft.fftn(x, axes=axes), axes=axes)
    c, nc = size // 2, new_size // 2
    if new_size < size:
        sl = tuple(slice(c - nc, c - nc + new_size) for _ in range(nd))
        ft2 = ft[sl]
    else:
        pad = [(nc - c, new_size - size - (nc - c))] * nd
        ft2 = jnp.pad(ft, pad)
    out = jnp.real(
        jnp.fft.ifftn(jnp.fft.ifftshift(ft2, axes=axes), axes=axes)
    )
    if preserve == "values":
        out = out * (new_size / size) ** nd
    return out


def extract_rl(x: jax.Array, factor: int) -> jax.Array:
    """Extract the central 1/factor region (IMG/VOL_EXTRACT_RL analogue)."""
    if factor == 1:
        return x
    nd = x.ndim
    big = x.shape[-1]
    size = big // factor
    lo = (big - size) // 2
    centered = jnp.fft.fftshift(x, axes=tuple(range(nd)))
    sl = tuple(slice(lo, lo + size) for _ in range(nd))
    return jnp.fft.ifftshift(centered[sl], axes=tuple(range(nd)))


# -- packed pixel rings -------------------------------------------------

class PackedRings(NamedTuple):
    """Static per-round pixel packing; all device arrays.

    i_col, i_row : (p,) int32 logical integer frequencies (half-space)
    i_sig        : (p,) int32 shell index round(|f|)
    mask         : (p,) float32, 1 for real pixels, 0 for lane padding
    n_valid      : int, count of real pixels
    r_u, r_l     : the ring bounds that generated this packing
    size         : image box size
    """

    i_col: jax.Array
    i_row: jax.Array
    i_sig: jax.Array
    mask: jax.Array
    n_valid: int
    r_u: int
    r_l: int
    size: int


@lru_cache(maxsize=32)
def pack_rings(size: int, r_u: int, r_l: int = 0, lane: int = 8) -> PackedRings:
    """Enumerate half-space frequencies with r_l <= round(|f|) < r_u and
    r_l^2 <= |f|^2 < r_u^2 (both conditions, Optimiser.cpp:8013-8025),
    skipping the duplicate (i == 0, j < 0) half-column.

    Lane granularity 8 (not 128): the projector's per-pixel gather cost
    scales with padded p, while the downstream MXU matmuls tolerate any
    p (XLA pads tiles internally) — so slim padding wins overall."""
    cols, rows, sigs = [], [], []
    for j in range(-r_u, r_u + 1):
        for i in range(0, r_u + 1):
            if i == 0 and j < 0:
                continue
            q = i * i + j * j
            if not (r_l * r_l <= q < r_u * r_u):
                continue
            v = int(round(np.sqrt(q)))
            if r_l <= v < r_u:
                cols.append(i)
                rows.append(j)
                sigs.append(v)
    n = len(cols)
    p = max(lane, ((n + lane - 1) // lane) * lane)
    pad = p - n
    i_col = np.asarray(cols + [0] * pad, dtype=np.int32)
    i_row = np.asarray(rows + [0] * pad, dtype=np.int32)
    i_sig = np.asarray(sigs + [0] * pad, dtype=np.int32)
    mask = np.asarray([1.0] * n + [0.0] * pad, dtype=np.float32)
    return PackedRings(
        jnp.asarray(i_col), jnp.asarray(i_row), jnp.asarray(i_sig),
        jnp.asarray(mask), n, r_u, r_l, size,
    )


def extract_packed(ft: jax.Array, rings: PackedRings) -> jax.Array:
    """Gather packed pixels from a centered full-space spectrum.

    ft: (..., size, size) complex; returns (..., p) complex.
    """
    c = rings.size // 2
    return ft[..., c + rings.i_row, c + rings.i_col]


def scatter_packed(vals: jax.Array, rings: PackedRings) -> jax.Array:
    """Inverse of extract_packed: build a centered full-space spectrum
    from packed half-space values, filling the conjugate hemisphere."""
    size = rings.size
    c = size // 2
    out = jnp.zeros(vals.shape[:-1] + (size, size), dtype=jnp.complex64)
    out = out.at[..., c + rings.i_row, c + rings.i_col].add(vals * rings.mask)
    out = out.at[..., c - rings.i_row, c - rings.i_col].add(
        jnp.conj(vals) * rings.mask * (rings.i_col > 0)
    )
    return out


def translate_phases(rings: PackedRings, trans: jax.Array) -> jax.Array:
    """Fourier-space translation ramps exp(-2 pi i (i tx + j ty)/size)
    for packed pixels (ImageFunctions.cpp:233-252).

    trans: (..., 2); returns (..., p) complex64.
    """
    size = rings.size
    phase = (2 * jnp.pi / size) * (
        rings.i_col.astype(jnp.float32) * trans[..., 0:1]
        + rings.i_row.astype(jnp.float32) * trans[..., 1:2]
    )
    return jax.lax.complex(jnp.cos(phase), -jnp.sin(phase))


def translate_ft(ft: jax.Array, tx, ty) -> jax.Array:
    """Translate a centered full-space 2D spectrum by (tx, ty) pixels."""
    size = ft.shape[-1]
    c = size // 2
    k = jnp.arange(size, dtype=jnp.float32) - c
    phase = (2 * jnp.pi / size) * (k[None, :] * tx + k[:, None] * ty)
    return ft * jnp.exp(-1j * phase).astype(ft.dtype)
