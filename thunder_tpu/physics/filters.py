"""Fourier filters on centered full-space arrays (src/Functions/Filter.cpp).

``f`` below is spatial frequency in cycles/pixel (integer shell / size).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


@lru_cache(maxsize=64)
def freq_norm(size: int, ndim: int) -> np.ndarray:
    """|f| in cycles/pixel over a centered grid (numpy: trace-safe cache)."""
    c = size // 2
    k = (np.arange(size) - c) / size
    if ndim == 2:
        ky, kx = np.meshgrid(k, k, indexing="ij")
        return np.sqrt(kx * kx + ky * ky).astype(np.float32)
    kz, ky, kx = np.meshgrid(k, k, k, indexing="ij")
    return np.sqrt(kx * kx + ky * ky + kz * kz).astype(np.float32)


def b_factor_filter(ft: jax.Array, b_factor) -> jax.Array:
    """dst = src * exp(-b/2 * |f|^2)  (Filter.cpp:13-44 uses -0.5 b f^2)."""
    f = freq_norm(ft.shape[-1], ft.ndim)
    return ft * jnp.exp(-0.5 * b_factor * f * f)


def low_pass_filter(ft: jax.Array, thres: float, ew: float) -> jax.Array:
    """Cosine-edge low-pass (Filter.cpp:46-95)."""
    f = freq_norm(ft.shape[-1], ft.ndim)
    w = jnp.where(
        f < thres,
        1.0,
        jnp.where(f > thres + ew, 0.0, jnp.cos((f - thres) * np.pi / ew) / 2 + 0.5),
    )
    return ft * w


def high_pass_filter(ft: jax.Array, thres: float, ew: float) -> jax.Array:
    """Cosine-edge high-pass (Filter.cpp:97-146)."""
    f = freq_norm(ft.shape[-1], ft.ndim)
    w = jnp.where(
        f > thres,
        1.0,
        jnp.where(f < thres - ew, 0.0, jnp.cos((thres - f) * np.pi / ew) / 2 + 0.5),
    )
    return ft * w


def fsc_weighting_filter(ft: jax.Array, fsc_curve: jax.Array) -> jax.Array:
    """Cref weighting sqrt(2 FSC / (1 + FSC)) per shell (Filter.cpp:148-176)."""
    f = freq_norm(ft.shape[-1], ft.ndim)
    idx = jnp.rint(f * ft.shape[-1]).astype(jnp.int32)
    n = fsc_curve.shape[0]
    inside = idx < n
    fsc_v = fsc_curve[jnp.minimum(idx, n - 1)]
    w = jnp.sqrt(jnp.maximum(0.0, 2 * fsc_v / (1 + fsc_v)))
    return ft * jnp.where(inside, w, 0.0)


def sharpen(ft: jax.Array, thres: float, ew: float, b_factor) -> jax.Array:
    """B-factor sharpening followed by low-pass (Spectrum.cpp:402-412)."""
    return low_pass_filter(b_factor_filter(ft, b_factor), thres, ew)
