"""Image preprocessing and noise-sigma initialization.

Mirrors Optimiser::initImg/statImg/substractBgImg/maskImg/normaliseImg
(Optimiser.cpp:4608-5035) and initSigma (:5145-5243):

  1. per image: estimate background mean/std outside the particle mask
     radius; subtract the mean and divide by the std (noise ~ N(0,1));
  2. keep the unmasked image (imgOri) and a soft-masked copy (img):
     zero-noise blend (zeroMask) or noise blend;
  3. forward FFT both;
  4. initial noise spectrum: sigma = (mean power spectrum - power of the
     mean image)/2 per ring, shared by all groups.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from thunder_tpu.constants import EDGE_WIDTH_RL
from thunder_tpu.ops.fourier import fft2_centered
from thunder_tpu.physics.mask import radial_grid, soft_mask_weight
from thunder_tpu.physics.spectrum import shell_count, shell_sum


class PreparedImages(NamedTuple):
    ft_masked: jax.Array    # (L, size, size) complex64 centered spectra
    ft_ori: jax.Array       # (L, size, size) unmasked spectra
    bg_mean: jax.Array      # (L,) pre-normalization background means
    bg_std: jax.Array       # (L,)


def preprocess_images(imgs: jax.Array, mask_radius_px: float,
                      zero_mask: bool = True,
                      key: jax.Array | None = None) -> PreparedImages:
    """imgs: (L, size, size) float32 real-space FFT-layout images."""
    size = imgs.shape[-1]
    u = radial_grid(size, 2)
    outside = (u > mask_radius_px).astype(jnp.float32)
    n_out = jnp.sum(outside)

    bg_mean = jnp.sum(imgs * outside, axis=(-2, -1)) / n_out
    bg_var = (
        jnp.sum((imgs - bg_mean[:, None, None]) ** 2 * outside, axis=(-2, -1))
        / jnp.maximum(n_out - 1, 1)
    )
    bg_std = jnp.sqrt(jnp.maximum(bg_var, 1e-12))

    normed = (imgs - bg_mean[:, None, None]) / bg_std[:, None, None]

    w = soft_mask_weight(size, 2, mask_radius_px, EDGE_WIDTH_RL)
    if zero_mask or key is None:
        masked = normed * w
    else:
        noise = jax.random.normal(key, normed.shape)
        masked = normed * w + noise * (1 - w)

    return PreparedImages(
        ft_masked=fft2_centered(masked).astype(jnp.complex64),
        ft_ori=fft2_centered(normed).astype(jnp.complex64),
        bg_mean=bg_mean,
        bg_std=bg_std,
    )


def init_sigma_from_moments(avg: jax.Array, p2_mean: jax.Array,
                            max_r: int) -> jax.Array:
    """Finalize the initial noise spectrum from the two image moments
    (mean spectrum, mean power image) — chunk-accumulable form for
    host-resident stacks."""
    size = avg.shape[-1]
    cnt = shell_count(size, 2, max_r)
    mean_ps = shell_sum(p2_mean, size, 2, max_r) / jnp.maximum(cnt, 1.0)
    # reference uses ringAverage of (re+im) of the mean image, squared
    ps_of_avg = (
        shell_sum(jnp.real(avg) + jnp.imag(avg), size, 2, max_r)
        / jnp.maximum(cnt, 1.0)
    ) ** 2
    sigma = (mean_ps - ps_of_avg) / 2
    return jnp.maximum(sigma, 1e-6)


def init_sigma(ft_ori: jax.Array, max_r: int) -> jax.Array:
    """Initial per-ring noise power: (E|X|^2 - |E X|^2)/2
    (Optimiser::initSigma, Optimiser.cpp:5145-5243).

    ft_ori: (L, size, size) centered spectra (this shard's images; the
    caller psums the two accumulators over the data axis first for an
    exact hemisphere-wide estimate).  Returns sigma (max_r,) float32.
    """
    avg = jnp.mean(ft_ori, axis=0)
    p2 = jnp.mean(jnp.abs(ft_ori) ** 2, axis=0)
    return init_sigma_from_moments(avg, p2, max_r)


def sigma_to_sig_rcp(sigma: jax.Array) -> jax.Array:
    """sigRcp = -0.5 / sigma (Optimiser.cpp:5242)."""
    return -0.5 / jnp.maximum(sigma, 1e-10)
