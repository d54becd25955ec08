"""Per-image projection-table routing (VERDICT r3 #1) and brick
out-of-margin recovery (VERDICT r3 weak #5).

Routing splits each hemisphere's images into a tight main batch (brick
table) and an outlier batch (corner-row table) instead of dropping the
whole round to the slow table when a few clouds rejuvenate.  The split
is semantically exact — the reference's phase loop is per-image
(Optimiser.cpp:1183) — so these tests check the machinery (permutation
round-trip, routed round execution) and the filter's recovery when a
cloud blows past the brick margin.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from thunder_tpu.config import ThunderConfig
from thunder_tpu.optimiser import (
    Optimiser,
    _spread_per_image_h,
    _take_l,
)
from thunder_tpu.physics.ctf import ctf_params

from test_e2e_3d import make_3d_dataset


def test_take_merge_roundtrip(rng):
    tree = {
        "r": jnp.asarray(rng.standard_normal((2, 12, 5, 4)), jnp.float32),
        "t": jnp.asarray(rng.standard_normal((2, 12, 3)), jnp.float32),
        "k": jnp.asarray(rng.standard_normal((2, 12)), jnp.float32),
    }
    order = np.stack([rng.permutation(12), rng.permutation(12)])
    order = order.astype(np.int32)
    idx = jnp.asarray(order)
    inv = jnp.asarray(np.argsort(order, axis=1).astype(np.int32))
    main = _take_l(tree, idx[:, :8])
    out = _take_l(tree, idx[:, 8:])
    assert main["r"].shape == (2, 8, 5, 4)
    assert out["t"].shape == (2, 4, 3)
    # segment merge as run_routed does it: concat back, undo the
    # spread permutation
    full = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=1),
                        main, out)
    back = _take_l(full, inv)
    for k in tree:
        np.testing.assert_array_equal(np.asarray(back[k]),
                                      np.asarray(tree[k]))


def test_spread_per_image_masks_invalid(key):
    # image 0: tight cloud; image 1: blown-up cloud; image 2: invalid
    q0 = np.tile([1.0, 0, 0, 0], (8, 1))
    q1 = np.random.default_rng(0).standard_normal((8, 4))
    q1 /= np.linalg.norm(q1, axis=1, keepdims=True)
    q = np.stack([q0, q1, q1])[None].repeat(2, 0).astype(np.float32)
    valid = np.array([[1, 1, 0], [1, 1, 0]], np.float32)
    dev = np.asarray(_spread_per_image_h(jnp.asarray(q),
                                         jnp.asarray(valid)))
    assert dev.shape == (2, 3)
    assert dev[0, 0] < 1e-3
    assert dev[0, 1] > 0.5
    assert dev[0, 2] == 0.0          # invalid -> main batch


def _small_optimiser(n=80, size=24):
    phantom, imgs, _, _ = make_3d_dataset(size, n)
    cfg = ThunderConfig(
        mode="3D", k=1, size=size, pixel_size=1.0, mask_radius=10.0,
        trans_s=1.5, init_res=3.0, global_search_res=2.4, sym="C1",
        m_s=512, m_l_r=16, m_l_t=5, m_reco=8,
        ignore_res=size * 1.0, trans_search_factor=0.25,
        ref_auto_recentre=False,
    )
    ctf = ctf_params(
        np.full(n, 300e3), np.full(n, 500.0), np.full(n, 500.0),
        np.zeros(n), np.full(n, 2e7), np.full(n, 0.1), np.zeros(n),
    )
    from scipy.ndimage import gaussian_filter

    init = gaussian_filter(np.fft.fftshift(phantom), 1.0)
    init = np.fft.ifftshift(init).astype(np.float32)
    opt = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64), init_refs=init)
    return opt, phantom


@pytest.mark.slow
def test_routed_round_executes(monkeypatch):
    """A round driven through the split path keeps shapes, stays
    finite, and records the routed table tag."""
    opt, _ = _small_optimiser()
    opt.run_round(0)
    # jump the state machine to LOCAL so the round-start plan may route
    # (the real _table_plan never bricks the start of a global round)
    from thunder_tpu.model import SEARCH_TYPE_LOCAL

    opt.model.search_type = SEARCH_TYPE_LOCAL

    def fake_plan(r_u, mid_round=False, spread_img=None):
        n_img = int(opt.state.par.r.shape[1])
        prng = np.random.default_rng(1)
        order = np.stack([prng.permutation(n_img),
                          prng.permutation(n_img)]).astype(np.int32)
        # three tiers incl. a mid rung — exercises the segmented path
        segs = ((n_img - 16, (5, 2)), (8, (6, 2)), (8, None))
        return ((5, 2), order, segs)

    monkeypatch.setattr(opt, "_table_plan", fake_plan)
    shapes = jax.tree.map(lambda a: a.shape, opt.state.par)
    rec = opt.run_round(1)
    assert "+route" in rec["proj_table"]
    assert jax.tree.map(lambda a: a.shape, opt.state.par) == shapes
    for leaf in jax.tree.leaves(opt.state.par):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
def test_brick_out_of_margin_recovery(monkeypatch):
    """VERDICT r3 weak #5: when clouds blow past the brick margin
    mid-round (the measured ~100-cell rejuvenation events), the
    zero-weight out-of-window design (ops/brick.py _axis_hat) must pull
    the filter back — no NaNs, no outward diffusion."""
    opt, _ = _small_optimiser()
    for i in range(2):
        opt.run_round(i)
    from thunder_tpu.model import SEARCH_TYPE_LOCAL

    opt.model.search_type = SEARCH_TYPE_LOCAL

    # inflate every 4th image's rotation cloud far past any margin
    par = opt.state.par
    r = np.asarray(par.r)
    prng = np.random.default_rng(2)
    wild = prng.standard_normal(r.shape).astype(np.float32)
    wild /= np.linalg.norm(wild, axis=-1, keepdims=True)
    blow = (np.arange(r.shape[1]) % 4 == 0)[None, :, None, None]
    mix = np.where(blow, 0.5 * r + 0.5 * wild, r)
    mix /= np.linalg.norm(mix, axis=-1, keepdims=True)
    opt.state.par = par._replace(r=jnp.asarray(mix))

    spread0 = np.asarray(opt._host(_spread_per_image_h(
        opt.state.par.r, opt.valid_dev)))

    # force the whole round onto a narrow brick rung
    monkeypatch.setenv("THUNDER_BRICK", "5,2")
    opt.run_round(2)

    spread1 = np.asarray(opt._host(_spread_per_image_h(
        opt.state.par.r, opt.valid_dev)))
    for leaf in jax.tree.leaves(opt.state.par):
        assert np.isfinite(np.asarray(leaf)).all()
    # the blown clouds re-converge rather than diffusing outward
    blown = np.arange(spread0.shape[1]) % 4 == 0
    assert np.median(spread1[:, blown]) < 0.8 * np.median(
        spread0[:, blown])


def _tight_cloud_optimiser(dev_rad: float, n: int = 32, size: int = 48,
                           r_phase: int = 14):
    """An Optimiser mid-refinement with INJECTED converged clouds:
    every image's rotation supports deviate from its top pose by at
    most ``dev_rad`` radians (deterministic small-angle perturbations —
    no ACG tails, which at converged production rounds are routed away
    per image, not present in every cloud).  rU follows the model's
    production arithmetic rU = r + maxR/3 (Model.cpp)."""
    from thunder_tpu.model import SEARCH_TYPE_LOCAL

    phantom, imgs, true_q, true_t = make_3d_dataset(size, n, snr=2.5)
    cfg = ThunderConfig(
        mode="3D", k=1, size=size, pixel_size=1.0, mask_radius=20.0,
        trans_s=1.0, init_res=3.0, global_search_res=2.4, sym="C1",
        m_s=256, m_l_r=16, m_l_t=5, m_reco=8,
        ignore_res=size * 1.0, trans_search_factor=0.25,
        ref_auto_recentre=False, g_search=False,
    )
    ctf = ctf_params(
        np.full(n, 300e3), np.full(n, 500.0), np.full(n, 500.0),
        np.zeros(n), np.full(n, 2e7), np.full(n, 0.1), np.zeros(n),
    )
    opt = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64),
                    init_refs=phantom)
    opt.model.search_type = SEARCH_TYPE_LOCAL
    opt.model.r = r_phase

    # converged clouds: supports at angle <= dev_rad around the top
    # pose, rotation axes spread deterministically
    par = opt.state.par
    q_top = np.asarray(par.r[:, :, 0])                     # (2, L, 4)
    shp = np.asarray(par.r.shape)
    n_r = int(shp[2])
    rng = np.random.default_rng(7)
    axes = rng.standard_normal((2, shp[1], n_r, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    ang = np.broadcast_to(
        dev_rad * np.linspace(0.2, 0.98, n_r)[None, None, :],
        axes.shape[:3])
    pert = np.concatenate(
        [np.cos(ang / 2)[..., None],
         np.sin(ang / 2)[..., None] * axes], axis=-1)
    # quat_mul(pert, top): rotate top by a small angle
    w1, x1, y1, z1 = [pert[..., i] for i in range(4)]
    w2, x2, y2, z2 = [q_top[..., i, None].repeat(n_r, -1)
                      for i in range(4)]
    cloud = np.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1).astype(np.float32)
    cloud[:, :, 0] = q_top                                  # rank-1 top
    opt.state.par = par._replace(r=jnp.asarray(cloud))
    return opt


def test_brick_engages_organically_on_converged_local_round():
    """VERDICT r4 #1 regression gate: a converged LOCAL round must
    engage a brick rung through the REAL _table_plan — no
    monkeypatching, no THUNDER_BRICK forcing.  Round 4's refactors
    silently disengaged the ladder (every bench round fell to
    'oct-half' while the routed dryrun, which forces the plan, stayed
    green); this asserts the end-to-end decision on a state whose
    clouds are unambiguously within every rung's margin."""
    # 0.3 cells at the PHASE band: spread_cells = 0.3 * any kick
    r_phase = 14
    dev = 0.3 / (1.3 * 2 * r_phase)
    opt = _tight_cloud_optimiser(dev, r_phase=r_phase)
    rec = opt.run_round(0)
    tab = rec.get("proj_table", "")
    assert tab.startswith("brick"), (
        f"brick ladder never engaged organically: {tab!r}")
    for leaf in jax.tree.leaves(opt.state.par):
        assert np.isfinite(np.asarray(leaf)).all()


def test_brick_plan_keys_on_phase_band_not_ru():
    """The round-4 disengagement mechanism, pinned: the table plan must
    key brick margins on the PHASE band r (where phases gather), not
    the reconstruction band rU = r + maxR/3 (commit 745876c keyed on
    rU and every 256px round fell off the ladder).  The injected
    spread fits rungs at r but NO rung at rU, so a plan keyed on the
    wrong band reports no brick table."""
    r_phase = 8
    opt = _tight_cloud_optimiser(0.01, r_phase=r_phase)
    r_u = int(opt.model.r_u)
    # fit threshold at r is 0.8 cells, the widest no-fit threshold at
    # rU is 1.2: the band ratio must clear 1.2/0.72
    assert r_u >= 1.7 * r_phase, "test premise broke: retune bands"
    # calibrate the injected spread against the plan's own statistic so
    # the margins are hit exactly: cells(r)=0.72 fits (4,1) (entry
    # threshold 0.8); cells(rU)>=1.44 fits nothing (widest admitted
    # threshold at a 48px box is 1.2 — span-8 needs a >=48 MB table)
    sp = np.asarray(opt._host(_spread_per_image_h(
        opt.state.par.r, opt.valid_dev)))
    measured = float(np.sort(np.nan_to_num(sp), axis=1)[:, -1].max())
    target = 0.72 / (1.3 * 2 * r_phase)
    opt2 = _tight_cloud_optimiser(0.01 * target / measured,
                                  r_phase=r_phase)
    rung, order, segs = opt2._table_plan(r_phase)
    assert rung is not None, (
        "plan refused a brick rung for a spread inside the phase-band "
        "margin — it is keying on the wrong band")
