"""Draw-compaction parity: reconstruct_round with compacted draws must
reproduce the plain-draws F/T grids (same RNG key => same underlying
draws; merging value-identical draws is exact, truncation touches only
the distinct-count tail).  Guards the per-draw weight plumbing order
through _insert_all_h / insert_sweep_3d."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

jax = pytest.importorskip("jax")


def test_reconstruct_round_compact_matches_plain(monkeypatch):
    from test_e2e_3d import make_3d_dataset

    from thunder_tpu.config import ThunderConfig
    from thunder_tpu.optimiser import Optimiser
    from thunder_tpu.physics.ctf import ctf_params

    size, n = 24, 48
    phantom, imgs, _q, _t = make_3d_dataset(size, n)
    cfg = ThunderConfig(
        mode="3D", k=1, size=size, pixel_size=1.0, mask_radius=10.0,
        trans_s=1.5, init_res=3.0, global_search_res=2.4, sym="C1",
        m_s=2048, m_l_r=32, m_l_t=9, m_reco=100,
        ignore_res=size * 1.0, trans_search_factor=0.25,
        ref_auto_recentre=False,
    )
    ctf = ctf_params(
        np.full(n, 300e3), np.full(n, 500.0), np.full(n, 500.0),
        np.zeros(n), np.full(n, 2e7), np.full(n, 0.1), np.zeros(n),
    )
    opt = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64),
                    init_refs=phantom)
    for i in range(2):
        opt.run_round(i)

    key = opt.key
    monkeypatch.setenv("THUNDER_RECO_COMPACT", "off")
    opt.key = key
    f0, t0, r_u0, g0 = opt.reconstruct_round()
    monkeypatch.delenv("THUNDER_RECO_COMPACT")
    opt.key = key
    f1, t1, r_u1, g1 = opt.reconstruct_round()

    assert (r_u0, g0) == (r_u1, g1)
    f0, f1 = np.asarray(f0), np.asarray(f1)
    t0, t1 = np.asarray(t0), np.asarray(t1)
    # after 2 rounds most clouds are concentrated: compaction is exact
    # for every image whose distinct-draw count fits the slot budget,
    # and the truncated tail is bounded — gate on relative energy
    df = np.linalg.norm(f1 - f0) / max(np.linalg.norm(f0), 1e-12)
    dt = np.linalg.norm(t1 - t0) / max(np.linalg.norm(t0), 1e-12)
    assert df < 2e-2, df
    assert dt < 2e-2, dt
