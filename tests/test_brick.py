"""Brick-mode projection (ops/brick.py): wide-row software-texture
gather for concentrated rotation clouds.

1. Value parity vs the corner-row gather for every (span, stride)
   config, at spreads inside the guaranteed margin.
2. A full local-search Optimiser round in brick mode must reproduce the
   corner-row round (same RNG keys, same data, tight resumed clouds):
   identical class/rank-1 poses and matching resolution.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from thunder_tpu.geometry.quaternion import random_quat, rotate3d
from thunder_tpu.ops.brick import (
    brick_pack_half,
    project_classed_brick,
    spread_margin,
)
from thunder_tpu.ops.fourier import pack_rings
from thunder_tpu.ops.projector import oct_pack, project_classed, ri_split


@pytest.mark.parametrize("span,stride", [(4, 1), (5, 2), (6, 2), (7, 3),
                                         (8, 2)])
def test_brick_matches_oct_within_margin(span, stride):
    rng = np.random.default_rng(0)
    B, K, L, R = 48, 2, 8, 16
    axes = (1, 2, 3)
    real = rng.standard_normal((K, B, B, B)).astype(np.float32)
    spec = np.fft.fftshift(np.fft.fftn(real, axes=axes),
                           axes=axes).astype(np.complex64)
    packed = ri_split(jnp.asarray(spec), pack_bf16=True)
    full = oct_pack(packed, False)
    tab = brick_pack_half(packed, span, stride)

    r_u = B // 2 - 4
    rings = pack_rings(B, r_u, 0)
    cls = jnp.asarray(rng.integers(0, K, L), jnp.int32)
    base = random_quat(jax.random.PRNGKey(1), (L,))
    # keep every sample at <= 40% of the guaranteed margin
    dq = 0.4 * spread_margin(span, stride) / (2 * r_u)
    small = random_quat(jax.random.PRNGKey(2), (L, R))
    q = base[:, None] + dq * small
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    rot = rotate3d(q)

    a = np.asarray(project_classed(full, cls, rot, rings, 1, False))
    b = np.asarray(project_classed_brick(tab, cls, rot, rings, 1, B,
                                         span, stride))
    np.testing.assert_allclose(b, a, atol=2e-5 * np.abs(a).max())


def _mini_opt(brick_force):
    import sys

    sys.path.insert(0, "tests")
    from test_e2e_3d import make_3d_dataset
    globals().setdefault("_DS", {})
    from thunder_tpu.config import ThunderConfig
    from thunder_tpu.io.thu import ThuTable
    from thunder_tpu.optimiser import Optimiser
    from thunder_tpu.physics.ctf import ctf_params

    size, n = 24, 32
    if "d" not in _DS:
        _DS["d"] = make_3d_dataset(size, n, snr=4.0)
    phantom, imgs, true_q, true_t = _DS["d"]
    cfg = ThunderConfig(
        mode="3D", k=1, size=size, pixel_size=1.0, mask_radius=10.0,
        trans_s=1.0, init_res=3.0, global_search_res=3.0, sym="C1",
        m_s=64, m_l_r=16, m_l_t=5, m_reco=8, ignore_res=24.0,
        trans_search_factor=0.1, g_search=False,
    )
    # must match make_3d_dataset's forward-model CTF (defocus 500)
    ctf = ctf_params(np.full(n, 300e3), np.full(n, 500.0),
                     np.full(n, 500.0), np.zeros(n), np.full(n, 2e7),
                     np.full(n, 0.1), np.zeros(n))
    thu = ThuTable.blank(n, voltage=300e3)
    thu.quat = np.asarray(true_q)
    thu.trans = np.asarray(true_t)
    thu.std_trans = np.full((n, 2), 0.2)
    # tight rotation cloud: the ACG k-columns follow the reference's
    # convention (covariance eigenvalues relative to 1 — SMALLER =
    # more concentrated, Particle.cpp:1004-1142)
    thu.k1 = np.full(n, 1e-6)
    thu.k2 = np.full(n, 1e-6)
    thu.k3 = np.full(n, 1e-6)
    opt = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64),
                    init_refs=phantom, resume_thu=thu)
    if brick_force is not None:
        opt._brick_choice = lambda r_u, *a, **kw: brick_force
    return opt, _DS["d"][2]


def _truth_error_deg(opt, true_q):
    """Median angular error of rank-1 poses vs ground truth (the
    C1-phantom has no symmetry ambiguity)."""
    top = np.zeros((opt.n_total, 4), np.float32)
    t = np.asarray(opt.state.par.top_r)
    for h in (0, 1):
        v = opt.valid[h]
        top[opt.index[h][v]] = t[h][v]
    dot = np.abs(np.sum(top * np.asarray(true_q), axis=-1))
    return float(np.median(np.degrees(2 * np.arccos(np.clip(dot, -1, 1)))))


def test_brick_round_reproduces_oct_round():
    """The particle filter is chaotic (ulp-level likelihood differences
    flip resampling draws), so the comparison is statistical: both the
    corner-row and the brick round must align the tightly-resumed
    clouds to ground truth equally well."""
    res = {}
    for name, force in (("oct", None), ("brick", (5, 2))):
        opt, true_q = _mini_opt(force)
        rec = opt.run_round(0)
        if force is not None:
            assert rec.get("proj_table", "").startswith("brick")
        res[name] = (_truth_error_deg(opt, true_q), rec["res_A"])
    # resumed at truth with tight clouds: both must stay aligned.
    # (bounds calibrated to the oct path's own seed-to-seed spread of
    # 4.2-9.3 deg at this snr/box — the posterior's intrinsic width;
    # the cross-path delta can span the whole band, so the real guards
    # are the absolute bounds)
    assert res["oct"][0] < 11.0, res
    assert res["brick"][0] < 11.0, res
    assert abs(res["oct"][0] - res["brick"][0]) < 7.0, res
    assert abs(res["oct"][1] - res["brick"][1]) < 2.0, res


def test_brick_ladder_policy():
    """The rung ladder picks the fastest config whose margin covers the
    measured spread AND whose table fits the byte budget; over-budget
    rungs fall through to coarser strides."""
    import thunder_tpu.optimiser as om
    from thunder_tpu.ops.brick import table_bytes

    opt, _ = _mini_opt(None)
    # synthetically concentrated clouds (the tiny test box's posterior
    # is intrinsically ~10 deg wide, far beyond any brick margin):
    # every support point within ~0.1 deg of the per-image mean
    par = opt.state.par
    r = np.asarray(par.r)
    tight = r[:, :, :1, :] + 1e-3 * np.asarray(
        np.random.default_rng(0).standard_normal(r.shape), np.float32)
    tight /= np.linalg.norm(tight, axis=-1, keepdims=True)
    opt.state.par = par._replace(r=jnp.asarray(tight))
    r_u = 8
    crop = om._proj_crop_size(opt.cfg.size, opt.cfg.pf, r_u)
    # tight clouds: the fastest rung wins outright
    assert opt._brick_choice(r_u, mid_round=True) == (4, 1)

    budget0 = om.BRICK_TABLE_BUDGET
    try:
        # squeeze out stride-1: (4,1) is the largest table of the
        # ladder, (5,2) the smallest
        om.BRICK_TABLE_BUDGET = table_bytes(4, 1, crop) - 1
        assert opt._brick_choice(r_u, mid_round=True) == (5, 2)
        # nothing fits: corner-row round
        om.BRICK_TABLE_BUDGET = 0
        assert opt._brick_choice(r_u, mid_round=True) is None
    finally:
        om.BRICK_TABLE_BUDGET = budget0


def test_brick_out_of_margin_recovery():
    """Out-of-margin recovery (the zero-weight design,
    ops/brick.py:_axis_hat): when a cloud blows past the brick margin
    MID-ROUND (the measured ~100-cell rejuvenation events), the
    out-of-window samples score as missing signal, which must pull the
    filter back toward its cloud — no NaNs, no outward diffusion —
    while the in-margin majority stays aligned."""
    opt, true_q = _mini_opt(None)
    # force whole-batch brick(5,2) regardless of measured spread: the
    # deliberate deviation under test is the out-of-margin gather
    # itself, which per-image routing would otherwise bypass
    opt._table_plan = (
        lambda r_u, mid_round=False, spread_img=None: ((5, 2), None, ()))

    par = opt.state.par
    r = np.asarray(par.r)                      # (hemi, L, R, 4)
    rng = np.random.default_rng(7)
    blown = np.arange(0, r.shape[1], 4)        # a quarter of the images
    wide = r.copy()
    # ~0.25 quaternion units of support scatter = tens of degrees =
    # many grid cells at r_u — far beyond brick(5,2)'s 1-cell margin
    noise = 0.25 * rng.standard_normal(
        (r.shape[0], len(blown)) + r.shape[2:]).astype(np.float32)
    wide[:, blown] = wide[:, blown] + noise
    wide[:, blown] /= np.linalg.norm(wide[:, blown], axis=-1,
                                     keepdims=True)
    opt.state.par = par._replace(r=jnp.asarray(wide))

    def spread_deg(q):
        """Per-image angular support spread (deg) about the first
        support point."""
        dot = np.abs(np.sum(q * q[:, :, :1], axis=-1).clip(-1, 1))
        return np.degrees(2 * np.arccos(dot)).max(axis=-1)  # (hemi, L)

    before = spread_deg(wide)
    rec = opt.run_round(0)
    assert rec.get("proj_table", "").startswith("brick")

    after_r = np.asarray(opt.state.par.r)
    assert np.isfinite(after_r).all()
    assert np.isfinite(np.asarray(opt.state.par.top_r)).all()
    assert np.isfinite(rec["res_A"])
    after = spread_deg(after_r)
    # recovery: every blown cloud re-concentrates (no diffusion); the
    # round's perturb/resample cycle plus the zero-weight penalty must
    # shrink the tens-of-degrees scatter decisively
    med_before = float(np.median(before[:, blown]))
    med_after = float(np.median(after[:, blown]))
    assert med_before > 15.0, med_before     # the blow-up really landed
    assert med_after < 0.5 * med_before, (med_before, med_after)
    # the untouched majority stays aligned to ground truth
    keep = np.setdiff1d(np.arange(r.shape[1]), blown)
    top = np.asarray(opt.state.par.top_r)
    err = []
    for h in (0, 1):
        v = np.asarray(opt.valid[h])
        idx = np.asarray(opt.index[h])[v]
        sel = np.isin(idx, keep)
        dot = np.abs(np.sum(top[h][v][sel] * np.asarray(true_q)[idx[sel]],
                            axis=-1)).clip(-1, 1)
        err.extend(np.degrees(2 * np.arccos(dot)))
    assert float(np.median(err)) < 11.0
