"""Auto-sized HBM residency (VERDICT r3 #6): a reference-scale config
must dry-plan under the per-chip budget with no manual knobs, and small
runs must not be pushed onto the slower host-streamed path."""

import numpy as np

from thunder_tpu.config import ThunderConfig
from thunder_tpu.optimiser import Optimiser
from thunder_tpu.parallel.mesh import make_mesh
from thunder_tpu.physics.ctf import ctf_params


def _small_opt(mesh=None, **cfg_kw):
    size, n = 24, 16
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((n, size, size)).astype(np.float32)
    cfg = ThunderConfig(
        mode="3D", k=1, size=size, pixel_size=1.0, mask_radius=10.0,
        trans_s=1.5, m_s=64, m_l_r=8, m_l_t=5, m_reco=4,
        ignore_res=size * 1.0, **cfg_kw,
    )
    ctf = ctf_params(
        np.full(n, 300e3), np.full(n, 500.0), np.full(n, 500.0),
        np.zeros(n), np.full(n, 2e7), np.full(n, 0.1), np.zeros(n),
    )
    return Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64), mesh=mesh)


def test_small_run_stays_device_resident():
    opt = _small_opt()
    assert "auto" not in opt.residency_plan
    assert not opt.cfg.host_ft_ori
    assert opt.residency_plan["total_gb"] < 1.0


def test_reference_scale_plan_fits_budget():
    """100k x 256px on an 8-chip mesh: the planner must flip
    host_ft_ori by itself and land under 16 GB/chip (the HostFt
    docstring arithmetic: ~6.5 GB/chip per stack copy)."""
    mesh = make_mesh(8, hemi=2)
    opt = _small_opt(mesh=mesh)
    # re-plan at reference scale without materializing 26 GB of images
    opt.cfg.size = 256
    opt.cfg.host_ft_ori = False
    opt.n_img = 100_000 // 2
    plan = opt._plan_residency()
    assert plan["auto"] == "host_ft_ori"
    assert opt.cfg.host_ft_ori
    assert plan["total_gb"] < 16.0, plan
    assert "warning" not in plan, plan


def test_single_chip_overflow_warns():
    opt = _small_opt()
    opt.cfg.size = 256
    opt.cfg.host_ft_ori = False
    opt.n_img = 100_000 // 2
    plan = opt._plan_residency()
    assert "warning" in plan        # nothing left to auto-enable
