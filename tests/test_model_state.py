"""Resolution & search-type state machine (Model.cpp:1147-1516)."""

import numpy as np

from thunder_tpu.model import (
    ModelState,
    SEARCH_TYPE_CTF,
    SEARCH_TYPE_GLOBAL,
    SEARCH_TYPE_LOCAL,
    SEARCH_TYPE_STOP,
)


def make_model(**kw):
    args = dict(n_class=1, size=64, pixel_size=1.0, r_init=8, r_global=12,
                max_r=31, l_search=True, c_search=False)
    args.update(kw)
    return ModelState(**args)


def good_fsc(r_good, max_r=31):
    fsc = np.zeros((1, max_r))
    fsc[0, :r_good] = 0.9
    return fsc


def test_initial_cutoff():
    m = make_model()
    assert m.r == 8  # min(r_init, r_global)
    assert m.search_type == SEARCH_TYPE_GLOBAL


def test_r_elevates_after_two_stagnant_rounds():
    m = make_model()
    m.set_fsc(good_fsc(20))
    # round 1: variance drops a lot -> no elevation
    m.set_t_vari(5.0, 5.0)
    m.update_r(0.143)
    assert m.r == 8
    # rounds 2,3: stagnation (<2% shrink) -> counter reaches 2 -> elevate
    m.set_t_vari(4.95, 4.95)
    m.update_r(0.143)
    assert m.r == 8
    m.set_t_vari(4.93, 4.93)
    m.update_r(0.143)
    assert m.r > 8
    assert m.r <= m.r_global  # global phase caps at rGlobal


def test_global_to_local_transition():
    m = make_model()
    m.set_fsc(good_fsc(25))
    # force stagnation until r reaches rGlobal and increase fires
    for _ in range(10):
        m.set_t_vari(1.0, 1.0)
        m.update_r(0.143)
        m.update_search_type()
        if m.search_type != SEARCH_TYPE_GLOBAL:
            break
    assert m.search_type == SEARCH_TYPE_LOCAL
    assert m.r == m.r_global


def test_local_to_stop_without_ctf():
    m = make_model()
    m.search_type = SEARCH_TYPE_LOCAL
    m.r = m.r_global
    m.set_fsc(good_fsc(14))
    m.res_top = 14
    m.res = 13  # never improves
    for _ in range(10):
        m.set_t_vari(1.0, 1.0)
        m.update_r(0.143)
        m.update_search_type()
        if m.search_type == SEARCH_TYPE_STOP:
            break
    assert m.search_type == SEARCH_TYPE_STOP


def test_local_to_ctf_when_enabled():
    m = make_model(c_search=True)
    m.search_type = SEARCH_TYPE_LOCAL
    m.r = m.r_global
    m.set_fsc(good_fsc(14))
    m.res_top = 14
    m.res = 13
    for _ in range(10):
        m.set_t_vari(1.0, 1.0)
        m.update_r(0.143)
        m.update_search_type()
        if m.search_type != SEARCH_TYPE_LOCAL:
            break
    assert m.search_type == SEARCH_TYPE_CTF
    # and CTF eventually stops too
    for _ in range(10):
        m.set_t_vari(1.0, 1.0)
        m.update_r(0.143)
        m.update_search_type()
        if m.search_type == SEARCH_TYPE_STOP:
            break
    assert m.search_type == SEARCH_TYPE_STOP


def test_local_r_growth_rate():
    """LOCAL elevation grows r by min(r*sqrt(1.5), r + (maxR-rGlobal)/8),
    capped by the FSC resolution."""
    m = make_model()
    m.search_type = SEARCH_TYPE_LOCAL
    m.r = 12
    m.set_fsc(good_fsc(31))
    m.set_t_vari(1.0, 1.0)
    m.update_r(0.143)
    expected = min(
        int(np.ceil(12 * np.sqrt(1.5))),
        int(np.ceil(12 + (31 - 12) / 8)),
    )
    assert m.r == expected


def test_resolution_improvement_resets_counter():
    m = make_model()
    m.search_type = SEARCH_TYPE_LOCAL
    m.r = m.r_global
    m.res_top = 10
    m.set_fsc(good_fsc(14))
    m.update_res(0.143)
    m.increase_r = True
    m.update_search_type()
    assert m.search_type == SEARCH_TYPE_LOCAL  # improved -> keep going
    assert m.res_top >= 13
    assert m.n_top_res_no_improve == 0
