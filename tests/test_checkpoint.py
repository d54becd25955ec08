"""Native checkpoint save/restore mid-run."""

import numpy as np
import jax.numpy as jnp
import pytest

from thunder_tpu.config import ThunderConfig
from thunder_tpu.optimiser import Optimiser
from thunder_tpu.physics.ctf import ctf_params


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    from test_e2e_2d import make_dataset

    size, n = 32, 32
    imgs, _ = make_dataset(size, n)
    cfg = ThunderConfig(
        mode="2D", k=2, size=size, pixel_size=1.0, mask_radius=12.0,
        trans_s=2.0, init_res=8.0, global_search_res=4.0, sym="C1",
        m_s_2d=32, m_l_r_2d=9, m_l_t=9, m_reco=8,
        ignore_res=size * 1.0, trans_search_factor=0.25,
    )
    ctf = ctf_params(
        np.full(n, 300e3), np.full(n, 2000.0), np.full(n, 2000.0),
        np.zeros(n), np.zeros(n), np.full(n, 0.1), np.zeros(n),
    )
    opt = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64))
    opt.run_round(0)
    path = str(tmp_path / "ckpt.npz")
    opt.save_checkpoint(path)

    # continue the original for one round
    rec_orig = opt.run_round(1)

    # fresh optimiser restored from the checkpoint must produce the
    # identical next round (same key, same state)
    opt2 = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64))
    opt2.load_checkpoint(path)
    rec_restored = opt2.run_round(1)

    np.testing.assert_allclose(
        np.asarray(opt.state.refs), np.asarray(opt2.state.refs),
        atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(opt.state.cls), np.asarray(opt2.state.cls)
    )
    assert rec_orig["res_shell"] == rec_restored["res_shell"]
