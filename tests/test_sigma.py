"""Noise-sigma estimation: initial (spectra difference) and residual
(rank-1) paths must recover a known noise power."""

import numpy as np
import jax
import jax.numpy as jnp

from thunder_tpu.ops.fourier import fft2_centered
from thunder_tpu.physics.spectrum import power_spectrum
from thunder_tpu.pipeline.preprocess import init_sigma, sigma_to_sig_rcp


def test_init_sigma_white_noise():
    """White N(0,1) pixel noise has flat Fourier power = size^2 per
    coefficient (unnormalized DFT); sigma = power/2 per component."""
    rng = np.random.default_rng(0)
    size, n = 32, 256
    imgs = rng.standard_normal((n, size, size)).astype(np.float32)
    ft = fft2_centered(jnp.asarray(imgs))
    sigma = np.asarray(init_sigma(ft, size // 2))
    expected = size * size / 2
    ratio = sigma[2:] / expected
    assert 0.8 < ratio.min() and ratio.max() < 1.2, ratio


def test_init_sigma_signal_is_conservative():
    """The reference's initSigma subtracts only the coherent (ring-mean)
    power of the average image (Optimiser.cpp:5195-5238), so a shared
    random-phase signal inflates the initial sigma — a deliberately
    conservative start that the rank-1 residual refresh tightens later.
    Verify the estimate covers signal + noise (never underestimates)."""
    rng = np.random.default_rng(1)
    size, n = 32, 512
    base = rng.standard_normal((size, size)).astype(np.float32) * 5
    imgs = base[None] + rng.standard_normal((n, size, size)).astype(np.float32)
    ft = fft2_centered(jnp.asarray(imgs))
    sigma = np.asarray(init_sigma(ft, size // 2))
    noise_power = size * size / 2
    assert (sigma[2:] >= 0.8 * noise_power).all()
    # and the total is about (signal + noise) power / 2
    total = (25 + 1) * size * size / 2
    assert sigma[2:].mean() < 2.5 * total


def test_sig_rcp_sign():
    s = sigma_to_sig_rcp(jnp.asarray([1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(s), [-0.5, -0.25])
