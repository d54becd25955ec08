"""Real-space masks: soft spherical masks, background estimation,
auto-masking (src/Functions/Mask.cpp).

Internal real-space layout is **FFT layout** (particle center at index
[0, 0], negative coordinates wrapped); radial grids below use wrapped
coordinates accordingly.  Device functions (soft mask, background) are
jittable; auto-mask generation is host-side numpy/scipy — it runs once
per round on a single volume and morphology maps poorly to XLA.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

GEN_MASK_INIT_STEP = 0.2   # include/Functions/Mask.h:31
GEN_MASK_GAP = 0.05        # include/Functions/Mask.h:33


@lru_cache(maxsize=64)
def radial_grid(size: int, ndim: int) -> np.ndarray:
    """Distance-from-origin over an FFT-layout grid (wrapped coords).

    Returns numpy (not jnp) so the cached constant is safe to reuse
    across jit traces.
    """
    k = np.minimum(np.arange(size), size - np.arange(size)).astype(np.float32)
    if ndim == 2:
        ky, kx = np.meshgrid(k, k, indexing="ij")
        return np.sqrt(kx * kx + ky * ky)
    kz, ky, kx = np.meshgrid(k, k, k, indexing="ij")
    return np.sqrt(kx * kx + ky * ky + kz * kz)


def soft_mask_weight(size: int, ndim: int, r: float, ew: float) -> jax.Array:
    """Cosine-edged spherical window: 1 inside r, 0 outside r+ew
    (Mask.cpp:333-351)."""
    u = radial_grid(size, ndim)
    return jnp.where(
        u > r + ew,
        0.0,
        jnp.where(u >= r, 0.5 + 0.5 * jnp.cos((u - r) / ew * np.pi), 1.0),
    )


def background(img: jax.Array, r: float, ew: float, sp_ndim: int = 2) -> jax.Array:
    """Edge-weighted mean of the region outside radius r (Mask.cpp:156-189).

    img: (..., size, size) [sp_ndim=2] or (..., size, size, size)
    [sp_ndim=3] in FFT layout.
    """
    u = radial_grid(img.shape[-1], sp_ndim)
    w = jnp.where(
        u > r + ew,
        1.0,
        jnp.where(u >= r, 0.5 - 0.5 * jnp.cos((u - r) / ew * np.pi), 0.0),
    )
    axes = tuple(range(img.ndim - sp_ndim, img.ndim))
    return jnp.sum(img * w, axis=axes) / jnp.sum(w)


def soft_mask(img: jax.Array, r: float, ew: float, bg=None,
              sp_ndim: int = 2) -> jax.Array:
    """Blend the image toward its background outside radius r
    (Mask.cpp:352-385). Supports batched images (..., size, size)."""
    w = soft_mask_weight(img.shape[-1], sp_ndim, r, ew)
    if bg is None:
        bg = background(img, r, ew, sp_ndim=sp_ndim)
    bg = jnp.asarray(bg)
    bg_b = bg[(...,) + (None,) * sp_ndim]
    return img * w + bg_b * (1 - w)


def soft_mask_noise(key: jax.Array, img: jax.Array, r: float, ew: float,
                    bg_mean: jax.Array, bg_std: jax.Array) -> jax.Array:
    """Blend toward Gaussian noise of the background statistics
    (Mask.cpp:387-417), used when masking data images for alignment."""
    sp_ndim = 2
    w = soft_mask_weight(img.shape[-1], sp_ndim, r, ew)
    noise = (bg_mean[(...,) + (None,) * sp_ndim]
             + jax.random.normal(key, img.shape) * bg_std[(...,) + (None,) * sp_ndim])
    return img * w + noise * (1 - w)


def _auto_mask_threshold(vol: np.ndarray, r: float) -> float:
    """Density-sorted partial-sum threshold search (Mask.cpp:733-800)."""
    size = vol.shape[-1]
    u = np.asarray(radial_grid(size, 3))
    data = np.maximum(0.0, vol[u < r]).astype(np.float64)
    data.sort()
    data = data[::-1]
    n = data.size
    partial = np.cumsum(data)
    total = partial[-1]
    if total <= 0:
        return 0.0
    start = int(np.searchsorted(partial, total * GEN_MASK_INIT_STEP))
    thres = 0.0
    step = GEN_MASK_INIT_STEP + GEN_MASK_GAP
    n_prev_bin = 0
    prev = 0
    bin_ = 0
    for i in range(start, n):
        if partial[i] < total * step:
            bin_ += 1
        else:
            if n_prev_bin != 0 and prev * 2 < bin_ * n_prev_bin:
                break
            step += GEN_MASK_GAP
            n_prev_bin += 1
            prev += bin_
            bin_ = 0
            thres = data[i]
    return float(thres)


def _remove_isolated_points(mask: np.ndarray) -> np.ndarray:
    """Drop connected components except the largest (Mask.cpp genMask's
    removeIsolatedPoint equivalent)."""
    from scipy import ndimage

    labels, n = ndimage.label(mask)
    if n <= 1:
        return mask
    sizes = ndimage.sum(mask, labels, range(1, n + 1))
    keep = int(np.argmax(sizes)) + 1
    return (labels == keep).astype(mask.dtype)


def auto_mask(vol: np.ndarray, r: float, ext: float = 0.0, ew: float = 0.0) -> np.ndarray:
    """Generate a soft auto-mask from a volume (host-side; Mask.cpp:733-824).

    vol: (size,)*3 float array in FFT layout. Returns float32 mask in
    the same layout: threshold -> largest component -> extend by
    ``ext`` voxels -> cosine soft edge of width ``ew``.
    """
    from scipy import ndimage

    thres = _auto_mask_threshold(vol, r)
    mask = (vol > thres).astype(np.float32)
    # morphology wants contiguous objects: go to centered layout
    mask_c = np.fft.fftshift(mask)
    mask_c = _remove_isolated_points(mask_c)
    if ext > 0:
        dist = ndimage.distance_transform_edt(mask_c == 0)
        mask_c = np.where(dist < ext, 1.0, mask_c).astype(np.float32)
    elif ext < 0:
        dist = ndimage.distance_transform_edt(mask_c == 1)
        mask_c = np.where(dist < -ext, 0.0, mask_c).astype(np.float32)
    if ew > 0:
        # distance of outside voxels to the object; cosine falloff
        # 1 -> 0 over [0, ew] (Mask.cpp softEdge:642-...)
        dist = ndimage.distance_transform_edt(mask_c == 0)
        edge = (dist != 0) & (dist < ew)
        soft = 0.5 + 0.5 * np.cos(dist / ew * np.pi)
        mask_c = np.where(edge, soft, mask_c).astype(np.float32)
    return np.fft.ifftshift(mask_c)
