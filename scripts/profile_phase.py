"""Component-level timing of ONE particle-filter phase at bench shapes
on the real chip: gather vs likelihood vs resample.

    python scripts/profile_phase.py [size] [n]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, *args, n=10):
    import jax
    out = f(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    return (time.time() - t0) / n


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import jax
    import jax.numpy as jnp
    from functools import partial
    from bench import make_dataset, _enable_compile_cache
    from thunder_tpu.config import ThunderConfig
    from thunder_tpu.optimiser import (
        Optimiser, _phase_step, _RingsView, translate_phases_view,
    )
    from thunder_tpu import particle as pt
    from thunder_tpu.geometry.quaternion import rotate3d
    from thunder_tpu.ops.projector import project_classed
    from thunder_tpu.ops.likelihood import log_dvp_local
    from thunder_tpu.physics.ctf import ctf_params

    _enable_compile_cache()
    rng = np.random.default_rng(0)
    vol, imgs, _ctf_cols, _quats, _trans = make_dataset(size, n, rng)
    cfg = ThunderConfig(
        mode="3D", k=1, size=size, pixel_size=1.32,
        mask_radius=size * 1.32 / 2 * 0.9,
        trans_s=3.0, init_res=12.0, global_search_res=8.0, sym="C1",
        m_s=1024, m_l_r=32, m_l_t=16, m_reco=16,
        ignore_res=size * 1.32, trans_search_factor=0.1,
    )
    ctf = ctf_params(
        np.full(n, 300e3),
        rng.uniform(10000, 25000, n), rng.uniform(10000, 25000, n),
        rng.uniform(0, np.pi, n), np.full(n, 2.0e7), np.full(n, 0.1),
        np.zeros(n),
    )
    opt = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64), init_refs=vol)
    # drive one round so the state matches the local-search regime
    opt.run_round(0)

    rings = opt._rings()
    proj_stack = opt._proj_stack(rings)
    dat_w, sctf2, a_term = opt._pack_inputs(rings)
    s = opt.state
    par0 = jax.tree.map(lambda a: a[0], s.par)   # hemisphere 0 slice
    cls0 = s.cls[0]
    d0, s2_0, a0 = dat_w[0], sctf2[0], a_term[0]
    ps0 = jax.tree.map(lambda a: a[0] if hasattr(a, 'shape') and a.shape[:1] == (2,) else a, proj_stack)
    if isinstance(proj_stack, jnp.ndarray) and proj_stack.shape[0] == 2:
        ps0 = proj_stack[0]
    else:
        ps0 = proj_stack[0] if hasattr(proj_stack, '__getitem__') else proj_stack
    key = jax.random.PRNGKey(7)

    L, R = par0.r.shape[:2]
    T = par0.t.shape[1]
    P = rings.i_col.shape[0]
    print(f"shapes: L={L} R={R} T={T} P={P} proj_stack={getattr(ps0, 'shape', '?')} "
          f"dtype={getattr(ps0, 'dtype', '?')}")

    # full phase step (per-hemisphere shapes)
    f_full = partial(_phase_step, size=cfg.size, pf=cfg.pf, mode=opt.mode,
                     pf_small=float(cfg.perturb_factor_s_local),
                     trans_s=float(cfg.trans_s))
    dt = timeit(lambda: f_full(key, par0, cls0, ps0, rings.i_col,
                               rings.i_row, d0, s2_0, a0))
    print(f"full phase step      : {dt*1e3:8.1f} ms")

    rot = rotate3d(par0.r)
    rv = _RingsView(rings.i_col, rings.i_row, cfg.size)

    @jax.jit
    def f_gather(ps, cls, rot):
        return project_classed(ps, cls, rot, rv, cfg.pf, False)

    dt_g = timeit(lambda: f_gather(ps0, cls0, rot))
    taps = L * R * P * 8
    print(f"projection gather    : {dt_g*1e3:8.1f} ms ({taps/dt_g/1e9:.1f} Gtaps/s)")

    pri = f_gather(ps0, cls0, rot)
    tra = translate_phases_view(rings.i_col, rings.i_row, cfg.size, par0.t)

    @jax.jit
    def f_dvp(d, s2, pri, tra, a):
        return log_dvp_local(d, s2, pri, tra, a)

    dt_d = timeit(lambda: f_dvp(d0, s2_0, pri, tra, a0))
    flops = L * R * T * P * 8
    print(f"likelihood (dvp)     : {dt_d*1e3:8.1f} ms ({flops/dt_d/1e12:.2f} TFLOP/s-ish)")

    @jax.jit
    def f_resample(key, par):
        k1, k2 = jax.random.split(key)
        par = pt.resample_r(k1, par, par.r.shape[1])
        par = pt.resample_t(k2, par, par.t.shape[1])
        par = pt.cal_vari_r(par, opt.mode)
        par = pt.cal_vari_t(par)
        return par

    dt_r = timeit(lambda: f_resample(key, par0))
    print(f"resample+vari        : {dt_r*1e3:8.1f} ms")

    @jax.jit
    def f_perturb(key, par):
        k1, k2 = jax.random.split(key)
        par = pt.perturb_r(k1, par, 0.2, opt.mode)
        return pt.perturb_t(k2, par, 0.2, float(cfg.trans_s))

    dt_p = timeit(lambda: f_perturb(key, par0))
    print(f"perturb              : {dt_p*1e3:8.1f} ms")

    @jax.jit
    def f_tra(t):
        return translate_phases_view(rings.i_col, rings.i_row, cfg.size, t)

    dt_t = timeit(lambda: f_tra(par0.t))
    print(f"translate phases     : {dt_t*1e3:8.1f} ms")
    print(f"sum of parts         : {(dt_g+dt_d+dt_r+dt_p+dt_t)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
