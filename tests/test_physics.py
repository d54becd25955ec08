import numpy as np
import jax
import jax.numpy as jnp

from thunder_tpu.physics.ctf import ctf_params, ctf_1d, ctf_packed, ctf_image
from thunder_tpu.physics.kernels import tik_rl, nik_rl, mkb_ft, mkb_rl
from thunder_tpu.physics import spectrum
from thunder_tpu.physics.filters import (
    low_pass_filter,
    high_pass_filter,
    b_factor_filter,
    fsc_weighting_filter,
)
from thunder_tpu.physics.mask import soft_mask, soft_mask_weight, background, auto_mask


# -- CTF ---------------------------------------------------------------


def _ctf_scalar_ref(f, voltage, defocus, cs, ac, ps):
    """Literal transcription of the reference formula (CTF.cpp:11-29)."""
    lam = 12.2643247 / np.sqrt(voltage * (1 + voltage * 0.978466e-6))
    w1 = np.sqrt(1 - ac**2)
    w2 = ac
    k1 = np.pi * lam
    k2 = np.pi / 2 * cs * lam**3
    ki = k1 * defocus * f**2 + k2 * f**4 - ps
    return -w1 * np.sin(ki) + w2 * np.cos(ki)


def test_ctf_1d_matches_reference_formula():
    f = np.linspace(0, 0.5, 64)
    got = ctf_1d(jnp.asarray(f), 300e3, -20000.0, 2.0e7, 0.1, 0.0)
    want = _ctf_scalar_ref(f, 300e3, -20000.0, 2.0e7, 0.1, 0.0)
    # chi reaches hundreds of radians; float32 phase error ~ 1e-7 * chi
    # bounds the CTF error (the single-precision reference matches this)
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_ctf_packed_matches_image():
    size, ps = 32, 1.32
    p = ctf_params(300e3, 21000.0, 20000.0, 0.3, 2.0e7, 0.1, 0.0)
    img = ctf_image(p, size, ps)
    c = size // 2
    i_col = np.array([1, 5, -3, 8, 0])
    i_row = np.array([2, -4, 7, 0, 3])
    packed = ctf_packed(p, jnp.asarray(i_col), jnp.asarray(i_row), size, ps)
    np.testing.assert_allclose(
        packed, img[c + i_row, c + i_col], atol=1e-5
    )


def test_ctf_astigmatism_axes():
    # pure astigmatism: CTF along x axis sees defocus -dU at theta=0
    size, ps = 64, 1.0
    p = ctf_params(300e3, 30000.0, 10000.0, 0.0, 0.0, 0.1, 0.0)
    img = np.asarray(ctf_image(p, size, ps))
    c = size // 2
    f = 10 / (ps * size)
    along_x = _ctf_scalar_ref(f, 300e3, -30000.0, 0.0, 0.1, 0.0)
    along_y = _ctf_scalar_ref(f, 300e3, -10000.0, 0.0, 0.1, 0.0)
    np.testing.assert_allclose(img[c, c + 10], along_x, atol=1e-4)
    np.testing.assert_allclose(img[c + 10, c], along_y, atol=1e-4)


# -- kernels -----------------------------------------------------------


def test_tik_nik_at_zero_and_decay():
    np.testing.assert_allclose(tik_rl(jnp.asarray(0.0)), 1.0, atol=1e-6)
    np.testing.assert_allclose(nik_rl(jnp.asarray(0.0)), 1.0, atol=1e-6)
    assert float(tik_rl(jnp.asarray(0.5))) < 1.0
    # sinc^2(pi * 1) = 0
    np.testing.assert_allclose(tik_rl(jnp.asarray(1.0)), 0.0, atol=1e-10)


def test_mkb_ft_support():
    a, alpha = 1.9, 15.0
    np.testing.assert_allclose(mkb_ft(jnp.asarray(0.0), a, alpha), 1.0, atol=1e-5)
    assert float(mkb_ft(jnp.asarray(a * 1.01), a, alpha)) == 0.0
    assert 0 < float(mkb_ft(jnp.asarray(a / 2), a, alpha)) < 1


def test_mkb_rl_positive_at_center():
    assert float(mkb_rl(jnp.asarray(0.0), 1.9, 15.0)) > 0


# -- spectrum ----------------------------------------------------------


def test_fsc_identical_volumes_is_one():
    rng = np.random.default_rng(0)
    size = 16
    vol = rng.normal(size=(size, size, size)) + 1j * rng.normal(size=(size, size, size))
    curve = spectrum.fsc(jnp.asarray(vol), jnp.asarray(vol), size // 2)
    np.testing.assert_allclose(curve, np.ones(size // 2), atol=1e-5)


def test_fsc_independent_noise_near_zero():
    rng = np.random.default_rng(1)
    size = 32
    a = rng.normal(size=(size,) * 3) + 1j * rng.normal(size=(size,) * 3)
    b = rng.normal(size=(size,) * 3) + 1j * rng.normal(size=(size,) * 3)
    curve = np.asarray(spectrum.fsc(jnp.asarray(a), jnp.asarray(b), size // 2))
    assert np.abs(curve[4:]).max() < 0.25  # high shells have many samples


def test_res_p():
    curve = np.array([1.0, 1.0, 0.9, 0.6, 0.1, 0.05])
    assert spectrum.res_p(curve, 0.143) == 3
    assert spectrum.res_p(curve, 0.143, pf=2) == 1


def test_power_spectrum_flat_for_white_noise():
    rng = np.random.default_rng(2)
    size = 32
    x = rng.normal(size=(size,) * 2)
    ft = np.fft.fftshift(np.fft.fft2(x))
    ps = np.asarray(spectrum.power_spectrum(jnp.asarray(ft), size // 2))
    assert ps[1:].max() / ps[1:].min() < 5


def test_b_factor_roundtrip():
    # apply a known B factor to a flat spectrum; estimate should recover it
    size = 48
    c = size // 2
    k = (np.arange(size) - c) / size
    kz, ky, kx = np.meshgrid(k, k, k, indexing="ij")
    f2 = kx**2 + ky**2 + kz**2
    b_true = 300.0
    ft = np.exp(-0.25 * b_true * f2).astype(np.complex64)
    b_est = float(spectrum.b_factor_est(jnp.asarray(ft), c - 2, 2))
    # ln|F| = -B/4 f^2 -> slope = -B/4, est = 2*slope = -B/2
    np.testing.assert_allclose(b_est, -b_true / 2, rtol=0.05)


def test_random_phase_preserves_amplitudes():
    rng = np.random.default_rng(3)
    size = 16
    ft = jnp.asarray(rng.normal(size=(size,) * 3) + 1j * rng.normal(size=(size,) * 3))
    out = spectrum.random_phase(ft, jax.random.PRNGKey(0), r=3)
    np.testing.assert_allclose(jnp.abs(out), jnp.abs(ft), atol=1e-5)
    u, _ = spectrum._shell_geometry(size, 3)
    inner = np.asarray(u) <= 3
    np.testing.assert_allclose(np.asarray(out)[inner], np.asarray(ft)[inner])


# -- filters -----------------------------------------------------------


def test_low_high_pass_partition():
    rng = np.random.default_rng(4)
    size = 32
    ft = jnp.asarray(rng.normal(size=(size,) * 2) + 1j * rng.normal(size=(size,) * 2))
    lo = low_pass_filter(ft, 0.2, 0.05)
    hi = high_pass_filter(ft, 0.2, 0.05)
    c = size // 2
    # DC passes low, blocked high
    assert np.abs(np.asarray(lo)[c, c]) > 0
    assert np.asarray(hi)[c, c] == 0


def test_b_factor_filter_dc_unchanged():
    size = 16
    ft = jnp.ones((size, size), dtype=jnp.complex64)
    out = b_factor_filter(ft, 200.0)
    c = size // 2
    np.testing.assert_allclose(np.asarray(out)[c, c], 1.0)
    assert np.abs(np.asarray(out)[c, c + 7]) < 1.0


def test_fsc_weighting_filter():
    size = 16
    ft = jnp.ones((size, size, size), dtype=jnp.complex64)
    curve = jnp.ones(size // 2)
    out = fsc_weighting_filter(ft, curve)
    c = size // 2
    np.testing.assert_allclose(np.asarray(out)[c, c, c], 1.0, atol=1e-6)


# -- masks -------------------------------------------------------------


def test_soft_mask_weight_profile():
    w = np.asarray(soft_mask_weight(32, 2, r=5, ew=4))
    assert w[0, 0] == 1.0          # origin (particle center in FFT layout)
    assert w[0, 5] == 1.0
    assert w[0, 16] == 0.0         # far field
    assert 0 < w[0, 7] < 1


def test_background_and_soft_mask():
    size = 32
    from thunder_tpu.physics.mask import radial_grid

    u = np.asarray(radial_grid(size, 2))
    img = np.where(u < 6, 3.0, 1.0).astype(np.float32)
    bg = float(background(jnp.asarray(img), 6, 4))
    np.testing.assert_allclose(bg, 1.0, atol=0.05)
    out = soft_mask(jnp.asarray(img), 6, 4)
    np.testing.assert_allclose(np.asarray(out)[0, 0], 3.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out)[0, 15], bg, atol=0.05)


def test_auto_mask_covers_blob():
    size = 32
    vol = np.zeros((size,) * 3, dtype=np.float32)
    # dense blob at the origin (FFT layout center)
    from thunder_tpu.physics.mask import radial_grid

    u = np.asarray(radial_grid(size, 3))
    vol = np.exp(-(u / 4.0) ** 2).astype(np.float32)  # smooth blob at origin
    m = auto_mask(vol, r=14, ext=1.0, ew=2.0)
    assert m[0, 0, 0] == 1.0
    assert m[16, 16, 16] == 0.0
    assert m.sum() >= vol.sum()
