"""Spectral statistics: shell averages, power spectra, FRC/FSC,
resolution conversion, B-factor estimation, phase randomization.

Layout convention: Fourier arrays are **centered full-space** — a 2D
array indexes [c + ky, c + kx], a 3D array [c + kz, c + ky, c + kx],
with c = size // 2 and integer frequencies in [-c, c).  Shell sums mask
to the half-space kx >= 0 (plus the kx = -c Nyquist column), matching
the reference's half-storage loops (src/Functions/Spectrum.cpp) so FSC
values agree shell-by-shell.

All shell reductions are one scatter-add over a precomputed integer
shell index — cheap, once-per-round host+device work.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


def nyquist(pixel_size: float) -> float:
    return 2.0 / pixel_size


def res_p2a(res_p, image_size: int, pixel_size: float):
    """Shell index -> spatial frequency [1/A] (Spectrum.cpp:19)."""
    return res_p / image_size / pixel_size


def res_a2p(res_a, image_size: int, pixel_size: float):
    return res_a * image_size * pixel_size


@lru_cache(maxsize=64)
def _shell_geometry(size: int, ndim: int):
    """(shell_index int32 array, halfspace bool mask) for a centered grid.

    Numpy outputs: cached constants must be trace-safe.
    """
    c = size // 2
    k = np.arange(size) - c
    if ndim == 2:
        ky, kx = np.meshgrid(k, k, indexing="ij")
        r = np.sqrt(kx * kx + ky * ky)
    else:
        kz, ky, kx = np.meshgrid(k, k, k, indexing="ij")
        r = np.sqrt(kx * kx + ky * ky + kz * kz)
    u = np.rint(r).astype(np.int32)
    half = (kx >= 0) | (kx == -c)
    return u, half


def shell_sum(values: jax.Array, size: int, ndim: int, n_shells: int,
              halfspace: bool = True) -> jax.Array:
    """Sum ``values`` (a centered full-space array) over integer shells."""
    u, half = _shell_geometry(size, ndim)
    v = jnp.where(half, values, 0.0) if halfspace else values
    u_cl = jnp.minimum(u, n_shells)  # overflow bin
    out = jnp.zeros(n_shells + 1, dtype=v.dtype).at[u_cl].add(v)
    return out[:n_shells]


def shell_count(size: int, ndim: int, n_shells: int, halfspace: bool = True) -> jax.Array:
    u, half = _shell_geometry(size, ndim)
    ones = half.astype(jnp.float32) if halfspace else jnp.ones_like(u, jnp.float32)
    u_cl = jnp.minimum(u, n_shells)
    out = jnp.zeros(n_shells + 1, dtype=jnp.float32).at[u_cl].add(ones)
    return out[:n_shells]


def shell_average(values: jax.Array, n_shells: int) -> jax.Array:
    """Radial average of a real centered array (Spectrum.cpp:129-159)."""
    size, ndim = values.shape[-1], values.ndim
    s = shell_sum(values, size, ndim, n_shells)
    cnt = shell_count(size, ndim, n_shells)
    return s / jnp.maximum(cnt, 1.0)


def power_spectrum(ft: jax.Array, n_shells: int) -> jax.Array:
    """Mean |F|^2 per shell (Spectrum.cpp:161-221)."""
    return shell_average(jnp.abs(ft) ** 2, n_shells)


def fsc(a: jax.Array, b: jax.Array, n_shells: int) -> jax.Array:
    """Fourier shell (3D) / ring (2D) correlation (Spectrum.cpp:223-337)."""
    size, ndim = a.shape[-1], a.ndim
    num = shell_sum(jnp.real(a * jnp.conj(b)), size, ndim, n_shells)
    pa = shell_sum(jnp.abs(a) ** 2, size, ndim, n_shells)
    pb = shell_sum(jnp.abs(b) ** 2, size, ndim, n_shells)
    den = jnp.sqrt(pa * pb)
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-30), 0.0)


def res_p(fsc_curve: np.ndarray, thres: float, pf: int = 1, r_l: int = 1) -> int:
    """First shell (from r_l up) where FSC drops below ``thres``, minus
    one, divided by pf (Spectrum.cpp:339-363, forward branch).  Host-side.
    """
    fsc_curve = np.asarray(fsc_curve)
    result = len(fsc_curve)
    for i in range(r_l, len(fsc_curve)):
        if fsc_curve[i] < thres:
            result = i
            break
    return (result - 1) // pf


def random_phase(ft: jax.Array, key: jax.Array, r: int) -> jax.Array:
    """Randomize phases of shells above radius ``r`` (Spectrum.cpp:365-386)."""
    size, ndim = ft.shape[-1], ft.ndim
    u, _ = _shell_geometry(size, ndim)
    phase = jax.random.uniform(key, ft.shape, minval=0.0, maxval=2 * np.pi)
    rot = jnp.exp(1j * phase).astype(ft.dtype)
    return jnp.where(u > r, ft * rot, ft)


def b_factor_est(ft: jax.Array, r_u: int, r_l: int) -> jax.Array:
    """Guinier-fit B factor: fit log(mean |F|) vs (u/N)^2 over shells
    [r_l, r_u); B = 2 * slope (Spectrum.cpp:414-453)."""
    size, ndim = ft.shape[-1], ft.ndim
    n = r_u
    amp = shell_sum(jnp.abs(ft), size, ndim, n, halfspace=False)
    cnt = shell_count(size, ndim, n, halfspace=False)
    u = jnp.arange(n)
    sel = u >= r_l
    y = jnp.log(jnp.maximum(amp / jnp.maximum(cnt, 1.0), 1e-30))
    x = ((u.astype(jnp.float32)) / size) ** 2
    # weighted least squares over selected shells
    w = sel.astype(jnp.float32)
    sw = jnp.sum(w)
    mx = jnp.sum(w * x) / sw
    my = jnp.sum(w * y) / sw
    slope = jnp.sum(w * (x - mx) * (y - my)) / jnp.maximum(jnp.sum(w * (x - mx) ** 2), 1e-30)
    return 2.0 * slope
