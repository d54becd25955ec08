"""Bounded HBM residency: host-resident ft_ori (HostFt) must reproduce
the device-resident path — same math streamed in L-chunks, with
intensity corrections folded into the lazy per-image scale instead of
rewriting the stack (Optimiser::allocPreCal's host-resident originals).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")


def _run(host_ft_ori, chunk, seed=0, rounds=3):
    from test_e2e_3d import make_3d_dataset
    from thunder_tpu.config import ThunderConfig
    from thunder_tpu.optimiser import Optimiser
    from thunder_tpu.physics.ctf import ctf_params

    size, n = 24, 32
    phantom, imgs, true_q, true_t = make_3d_dataset(size, n, snr=3.0)
    cfg = ThunderConfig(
        mode="3D", k=1, size=size, pixel_size=1.0, mask_radius=10.0,
        trans_s=1.5, init_res=4.0, global_search_res=3.0, sym="C1",
        m_s=128, m_l_r=12, m_l_t=6, m_reco=8, ignore_res=24.0,
        trans_search_factor=0.25, host_ft_ori=host_ft_ori,
        host_ft_chunk=chunk,
    )
    ctf = ctf_params(np.full(n, 300e3), np.full(n, 500.0),
                     np.full(n, 500.0), np.zeros(n), np.full(n, 2e7),
                     np.full(n, 0.1), np.zeros(n))
    opt = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64),
                    init_refs=phantom)
    for i in range(rounds):
        opt.run_round(i)
    return opt


def test_host_ft_single_chunk_bitwise():
    """chunk >= L: the streamed graph is the device graph with a host
    round-trip of identical bytes — results must match exactly."""
    a = _run(False, 9999)
    b = _run(True, 9999)
    np.testing.assert_array_equal(np.asarray(a.state.sigma),
                                  np.asarray(b.state.sigma))
    np.testing.assert_array_equal(np.asarray(a.state.par.top_r),
                                  np.asarray(b.state.par.top_r))
    np.testing.assert_array_equal(np.asarray(a.state.refs),
                                  np.asarray(b.state.refs))


def test_host_ft_chunked_statistical():
    """Multi-chunk accumulation reorders float sums; the refinement must
    still converge equivalently (resolution within a shell-ish)."""
    a = _run(False, 9999)
    b = _run(True, 8)
    ra = a.round_records[-1]["res_A"]
    rb = b.round_records[-1]["res_A"]
    assert abs(ra - rb) < 2.0, (ra, rb)
    # the host copy stayed on host: ft_ori is a HostFt, scale applied
    from thunder_tpu.optimiser import HostFt

    assert isinstance(b.data.ft_ori, HostFt)
