"""End-to-end 3D refinement on synthetic data (demo.json analogue)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from thunder_tpu.config import ThunderConfig
from thunder_tpu.geometry.quaternion import random_quat, rotate3d
from thunder_tpu.optimiser import Optimiser
from thunder_tpu.ops.fourier import ifft2_centered, pack_rings, translate_ft
from thunder_tpu.ops.projector import prepare_projectee_3d, project_full_3d
from thunder_tpu.physics.ctf import ctf_params
from thunder_tpu.physics.mask import radial_grid


def make_3d_dataset(size=24, n=48, seed=0, snr=2.0, defocus=500.0):
    # tiny test boxes need a tiny defocus: at 24 px / 1 A the CTF of a
    # realistic 1.5 um defocus would oscillate several periods per shell
    from thunder_tpu.physics.ctf import ctf_image, ctf_params as mk_ctf

    rng = np.random.default_rng(seed)
    c = size // 2
    k = np.arange(size) - c
    kz, ky, kx = np.meshgrid(k, k, k, indexing="ij")
    phantom = np.fft.ifftshift(
        np.exp(-((kx - 3) ** 2 + ky**2 + kz**2) / (2 * 2.5**2))
        + np.exp(-((kx + 2) ** 2 + (ky - 2) ** 2 + kz**2) / (2 * 2.0**2))
        + np.exp(-(kx**2 + (ky + 3) ** 2 + (kz - 2) ** 2) / (2 * 1.5**2))
    ).astype(np.float32)

    proj = prepare_projectee_3d(jnp.asarray(phantom), pf=2)
    quats = random_quat(jax.random.PRNGKey(seed), (n,))
    rots = rotate3d(quats)
    trans = rng.uniform(-1.5, 1.5, size=(n, 2))

    # forward model includes the CTF: dat = CTF * Proj * Translate
    p = mk_ctf(np.full(n, 300e3), np.full(n, defocus), np.full(n, defocus),
               np.zeros(n), np.full(n, 2e7), np.full(n, 0.1), np.zeros(n))
    ctf_imgs = np.asarray(ctf_image(p, size, 1.0))

    imgs = []
    for i in range(n):
        ft = project_full_3d(proj, rots[i])
        ft = translate_ft(ft, trans[i, 0], trans[i, 1])
        ft = ft * ctf_imgs[i]
        im = np.asarray(ifft2_centered(ft))
        im = im * snr / max(im.std(), 1e-6)
        im = im + rng.standard_normal((size, size)).astype(np.float32)
        imgs.append(im.astype(np.float32))
    return phantom, np.stack(imgs), np.asarray(quats), trans


@pytest.mark.slow
def test_3d_refinement_improves_reference():
    size, n = 24, 48
    phantom, imgs, true_q, true_t = make_3d_dataset(size, n)

    cfg = ThunderConfig(
        mode="3D", k=1, size=size, pixel_size=1.0, mask_radius=10.0,
        trans_s=1.5, init_res=3.0, global_search_res=2.4, sym="C1",
        m_s=2048, m_l_r=32, m_l_t=9, m_reco=16,
        ignore_res=size * 1.0, trans_search_factor=0.25,
        ref_auto_recentre=False,  # test phantoms are deliberately off-center
    )
    ctf = ctf_params(
        np.full(n, 300e3), np.full(n, 500.0), np.full(n, 500.0),
        np.zeros(n), np.full(n, 2e7), np.full(n, 0.1), np.zeros(n),
    )
    # start from a low-passed version of the truth (standard init-model
    # situation); refinement must sharpen it
    from scipy.ndimage import gaussian_filter

    init = gaussian_filter(np.fft.fftshift(phantom), 1.0)
    init = np.fft.ifftshift(init).astype(np.float32)

    opt = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64), init_refs=init)

    u = np.asarray(radial_grid(size, 3))
    m = u < size // 2 - 4

    def corr_with_truth():
        rec = opt.class_averages()[0]
        return np.corrcoef(rec[m], phantom[m])[0, 1]

    corr0 = np.corrcoef(init[m], phantom[m])[0, 1]
    best_median = 0.0
    for i in range(8):
        opt.run_round(i)
        top_r = np.asarray(opt.state.par.top_r)        # (2, L, 4)
        dots = np.concatenate([
            np.abs(np.sum(top_r[h][opt.valid[h]]
                          * true_q[opt.index[h][opt.valid[h]]], axis=1))
            for h in (0, 1)
        ])
        best_median = max(best_median, float(np.median(dots)))
    corr = corr_with_truth()
    # the reconstruction is band-limited to the FSC-capped cutoff, so it
    # cannot out-correlate the all-shell gaussian blur of the init;
    # demand a high absolute correlation plus pose bootstrap instead
    assert corr > 0.9, f"3D refine corr {corr} (init {corr0})"
    # E-M bootstrap: poses improve from ~random (median |dot| ~ 0.3 at
    # round 0 with the blurred init) to well-aligned
    assert best_median > 0.55, f"best median pose dot {best_median}"


@pytest.mark.slow
def test_3d_round_with_mkb_kernel():
    """One production round with the MKB blob insertion option
    (reco_kernel='mkb', Reconstructor.cpp:424-567 / Config.h:95)."""
    size, n = 24, 16
    phantom, imgs, true_q, true_t = make_3d_dataset(size, n)
    cfg = ThunderConfig(
        mode="3D", k=1, size=size, pixel_size=1.0, mask_radius=10.0,
        trans_s=1.5, init_res=4.0, global_search_res=3.0, sym="C1",
        m_s=256, m_l_r=12, m_l_t=9, m_reco=8,
        ignore_res=size * 1.0, trans_search_factor=0.25,
        ref_auto_recentre=False, reco_kernel="mkb",
    )
    ctf = ctf_params(
        np.full(n, 300e3), np.full(n, 500.0), np.full(n, 500.0),
        np.zeros(n), np.full(n, 2e7), np.full(n, 0.1), np.zeros(n),
    )
    opt = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64),
                    init_refs=phantom)
    opt.run_round(0)
    refs = np.asarray(opt.state.refs)
    assert np.all(np.isfinite(refs))
    from thunder_tpu.physics.mask import radial_grid as rg
    m = np.asarray(rg(size, 3)) < size // 2 - 4
    corr = np.corrcoef(refs[0, 0][m], np.asarray(phantom)[m])[0, 1]
    assert corr > 0.8, f"MKB round phantom corr {corr}"
