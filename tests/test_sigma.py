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


def _mini_opt(k=1, n=40, size=24, seed=0, group_scl=False, n_group=1):
    from thunder_tpu.config import ThunderConfig
    from thunder_tpu.optimiser import Optimiser
    from thunder_tpu.physics.ctf import ctf_params

    rng = np.random.default_rng(seed)
    imgs = rng.normal(size=(n, size, size)).astype(np.float32)
    vol = np.zeros((size, size, size), np.float32)
    vol[8:14, 8:14, 8:14] = 1.0
    ctf = ctf_params(
        voltage=np.full(n, 300e3), defocus_u=np.full(n, 1.2e4),
        defocus_v=np.full(n, 1.3e4), defocus_theta=np.zeros(n),
        cs=np.zeros(n), amplitude_contrast=np.full(n, 0.1),
        phase_shift=np.zeros(n))
    cfg = ThunderConfig(
        size=size, k=k, pixel_size=1.32, mask_radius=13, trans_s=1.0,
        mode="3D", m_s=32, m_l_r=6, m_l_t=4, m_reco=4, iter_max=2,
        group_scl=group_scl)
    group = (np.arange(n) % n_group).astype(np.int64)
    return Optimiser(cfg, imgs, ctf, group, init_refs=vol)


def test_fused_max_stats_matches_sequential():
    """_max_stats_h (fused norm+sigma+scale, one pass) must match the
    sequential norm_correction -> refresh_sigma path exactly: the
    closed-form rescale s^2*d2 - 2s*xa + aa equals the residual power
    of the rescaled images."""
    from thunder_tpu.model import SEARCH_TYPE_LOCAL

    opt_a = _mini_opt(seed=3)
    opt_b = _mini_opt(seed=3)
    # identical particle state in both
    for opt in (opt_a, opt_b):
        opt.run_round(0)
    np.testing.assert_allclose(np.asarray(opt_a.state.par.top_r),
                               np.asarray(opt_b.state.par.top_r))
    # force the LOCAL-round stats branch (do_norm=True)
    for opt in (opt_a, opt_b):
        opt.model.search_type = SEARCH_TYPE_LOCAL

    opt_a.maximization_stats(i_round=1)

    opt_b.norm_correction()
    opt_b.refresh_sigma()

    np.testing.assert_allclose(np.asarray(opt_a.state.sigma),
                               np.asarray(opt_b.state.sigma),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(opt_a.data.ft_masked),
                               np.asarray(opt_b.data.ft_masked),
                               rtol=2e-4, atol=2e-4)


def test_fused_max_stats_scale_matches_sequential():
    """Global-round branch: fused scale correction == refresh_sigma +
    correct_scale."""
    opt_a = _mini_opt(seed=5, group_scl=True, n_group=4)
    opt_b = _mini_opt(seed=5, group_scl=True, n_group=4)
    for opt in (opt_a, opt_b):
        opt.run_round(0)

    opt_a.maximization_stats(i_round=1)

    opt_b.refresh_sigma()
    opt_b.correct_scale()

    np.testing.assert_allclose(np.asarray(opt_a.state.sigma),
                               np.asarray(opt_b.state.sigma),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(opt_a.data.ft_masked),
                               np.asarray(opt_b.data.ft_masked),
                               rtol=2e-4, atol=2e-4)
