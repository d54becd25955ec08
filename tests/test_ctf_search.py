"""Defocus-factor refinement (SEARCH_TYPE_CTF)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from thunder_tpu.config import ThunderConfig
from thunder_tpu.model import SEARCH_TYPE_CTF
from thunder_tpu.optimiser import Optimiser
from thunder_tpu.physics.ctf import ctf_image, ctf_params


@pytest.mark.slow
def test_ctf_search_recovers_defocus_factor():
    from tests.test_e2e_3d import make_3d_dataset  # noqa
    import sys
    sys.path.insert(0, "tests")
    from test_e2e_3d import make_3d_dataset

    size, n = 24, 32
    true_factor = 1.10

    # generate with a *scaled* defocus; the table carries the unscaled one
    phantom, imgs, true_q, true_t = make_3d_dataset(
        size, n, snr=8.0, defocus=1200.0 * true_factor
    )

    cfg = ThunderConfig(
        mode="3D", k=1, size=size, pixel_size=1.0, mask_radius=10.0,
        trans_s=1.5, init_res=3.0, global_search_res=2.4, sym="C1",
        m_s=256, m_l_r=16, m_l_t=9, m_l_d=9, m_reco=8, c_search=True,
        ignore_res=size * 1.0, trans_search_factor=0.25,
        ctf_refine_s=0.1,
    )
    ctf = ctf_params(
        np.full(n, 300e3), np.full(n, 1200.0), np.full(n, 1200.0),
        np.zeros(n), np.full(n, 2e7), np.full(n, 0.1), np.zeros(n),
    )
    opt = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64), init_refs=phantom)

    # inject true poses and jump straight to the CTF stage
    L = opt.n_img
    par = opt.state.par
    n_r, n_t = par.r.shape[2], par.t.shape[2]
    tq = jnp.asarray(true_q[opt.index], jnp.float32)     # (2, L, 4)
    tt = jnp.asarray(true_t[opt.index], jnp.float32)     # (2, L, 2)
    opt.state.par = par._replace(
        r=jnp.broadcast_to(tq[:, :, None, :], (2, L, n_r, 4)),
        t=jnp.broadcast_to(tt[:, :, None, :], (2, L, n_t, 2)),
        top_r=tq, top_t=tt,
        k1=jnp.full((2, L), 0.001), k2=jnp.full((2, L), 0.001),
        k3=jnp.full((2, L), 0.001),
        s0=jnp.full((2, L), 0.05), s1=jnp.full((2, L), 0.05),
    )
    opt.model.search_type = SEARCH_TYPE_CTF
    opt.model.r = size // 2 - 2

    # intensity-scale correction removes the amplitude mismatch that
    # would otherwise bias the defocus-magnitude fit (correctScale)
    opt.correct_scale(init=False)

    rings = opt._rings()
    for _ in range(8):      # several CTF-search rounds
        opt.local_phases(rings)

    top_d = np.asarray(opt.state.par.top_d)[opt.valid]
    med = float(np.median(top_d))
    assert abs(med - true_factor) < 0.04, f"median defocus factor {med}"
    # and clearly distinguishes from the unscaled hypothesis
    assert med > 1.04
