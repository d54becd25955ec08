"""Split the particle-filter phase cost into gather / likelihood /
particle-machinery at the bench operating point.

    python scripts/micro_phase2.py [size] [n]

Times (hot, host-fetch synced):
  - _phase_loop_h with a FIXED phase count k in {2, 6} -> per-phase
    slope + fixed overhead
  - projection gather alone
  - likelihood (log_dvp + marginals) alone, gather precomputed
  - particle machinery alone (perturb/clip/resample/cal_vari), no
    likelihood
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    bench._enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from thunder_tpu import particle as pt
    from thunder_tpu.config import ThunderConfig
    from thunder_tpu.optimiser import (
        Optimiser,
        _phase_loop_h,
        _phase_body,
        _project_any,
        _RingsView,
        translate_phases_view,
    )
    from thunder_tpu.ops.likelihood import log_dvp_local
    from thunder_tpu.geometry.quaternion import rotate3d
    from thunder_tpu.physics.ctf import ctf_params

    rng = np.random.default_rng(0)
    vol, imgs, ctf_cols, _, _ = bench.make_dataset(size, n, rng)
    cfg = ThunderConfig(
        mode="3D", k=1, size=size, pixel_size=1.32,
        mask_radius=size * 1.32 / 2 * 0.9,
        trans_s=3.0, init_res=12.0, global_search_res=8.0, sym="C1",
        m_s=10000, m_l_r=125, m_l_t=9, m_reco=100,
        ignore_res=size * 1.32, trans_search_factor=0.1,
    )
    ctf = ctf_params(*ctf_cols)
    opt = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64), init_refs=vol)
    opt.run_round(0)

    rings = opt._rings()
    proj_stack = opt._proj_stack(rings)
    dat_w, sctf2, a_term = opt._pack_inputs(rings)
    s = opt.state
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 2)
    mode = opt.mode

    def sync(x):
        leaves = jax.tree.leaves(x)
        tot = 0.0
        for l in leaves[:4]:
            tot += float(jnp.real(jnp.ravel(l)[0]))
        return tot

    def timeit(label, fn, *args, reps=3):
        out = fn(*args)
        sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
            sync(out)
        dt = (time.time() - t0) / reps * 1e3
        print(f"  {label:34s} {dt:9.1f} ms", flush=True)
        return dt

    print(f"operating point: size={size} L={s.par.r.shape[1]} "
          f"R={s.par.r.shape[2]} T={s.par.t.shape[2]} "
          f"P={rings.i_col.shape[0]} r={opt.model.r}", flush=True)

    # 1. whole loop at fixed phase counts (min==max forces exactly k)
    fmax = float(np.finfo(np.float32).max)
    state0 = (jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
              jnp.full((2, 3), fmax, jnp.float32))
    for k in (2, 6):
        timeit(f"phase_loop k={k}",
               lambda k=k: _phase_loop_h(
                   keys, s.par, s.cls, proj_stack, rings.i_col, rings.i_row,
                   dat_w, sctf2, a_term, jnp.asarray(k, jnp.int32),
                   jnp.asarray(k, jnp.int32), state0,
                   cfg.size, cfg.pf, mode,
                   float(cfg.perturb_factor_s_global), float(cfg.trans_s),
                   seq=True))

    # 2. gather alone (per-hemisphere vmapped like the loop)
    @partial(jax.jit, static_argnames=())
    def gather_only(par_r, cls):
        def one(r, cl):
            rot = rotate3d(r)
            pri = _project_any(proj_stack[0], cl, rot,
                               _RingsView(rings.i_col, rings.i_row, cfg.size),
                               cfg.pf, False, None)
            return jnp.sum(jnp.real(pri)) + jnp.sum(jnp.imag(pri))
        return jax.lax.map(lambda t: one(*t), (par_r, cls))

    timeit("gather only (both hemis)", gather_only, s.par.r, s.cls)

    # 3. likelihood alone: pri precomputed once
    def make_pri(r, cl):
        rot = rotate3d(r)
        return _project_any(proj_stack[0], cl, rot,
                            _RingsView(rings.i_col, rings.i_row, cfg.size),
                            cfg.pf, False, None)
    pri0 = jax.jit(make_pri)(s.par.r[0], s.cls[0])
    pri0 = jax.block_until_ready(pri0)

    @jax.jit
    def lik_only(pri, t, w_t, w_r, dw, s2, at):
        tra = translate_phases_view(rings.i_col, rings.i_row, cfg.size, t)
        dvp = log_dvp_local(dw, s2, pri, tra, at)
        base = jnp.max(dvp, axis=(1, 2), keepdims=True)
        w = jnp.exp(dvp - base)
        u_r = jnp.einsum("lrt,lt->lr", w, w_t)
        u_t = jnp.einsum("lrt,lr->lt", w, w_r)
        return u_r, u_t

    timeit("likelihood only (1 hemi)", lik_only, pri0, s.par.t[0],
           s.par.w_t[0], s.par.w_r[0], dat_w[0], sctf2[0], a_term[0])

    # 4. particle machinery alone (no likelihood: u = w)
    @partial(jax.jit, static_argnames=("mode",))
    def particle_only(key, par, mode):
        def one(k, p):
            kr, kt2, krs, kts = jax.random.split(k, 4)
            p = pt.perturb_r(kr, p, float(cfg.perturb_factor_s_global), mode)
            p = pt.perturb_t(kt2, p, float(cfg.perturb_factor_s_global),
                             float(cfg.trans_s))
            p = p._replace(u_r=p.w_r, u_t=p.w_t)
            p = pt.clip_u_r(p, mode)
            p = pt.resample_r(krs, p, p.r.shape[1])
            p = pt.resample_t(kts, p, p.t.shape[1])
            p = pt.cal_vari_r(p, mode)
            p = pt.cal_vari_t(p)
            return p
        return jax.lax.map(lambda t: one(*t), (jax.random.split(key, 2), par))

    timeit("particle machinery (both hemis)", particle_only, key, s.par, mode)


if __name__ == "__main__":
    main()
