"""Stage-level wall-clock breakdown of one E-M round on the real chip.

Runs the bench workload (bench.py's config) and times each stage of
run_round with block_until_ready barriers, twice (compile + hot).

    python scripts/profile_round.py [size] [n]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import jax
    from bench import make_dataset, _enable_compile_cache
    from thunder_tpu.config import ThunderConfig
    from thunder_tpu.optimiser import Optimiser
    from thunder_tpu.physics.ctf import ctf_params

    _enable_compile_cache()
    rng = np.random.default_rng(0)
    vol, imgs, _ctf_cols, _quats, _trans = make_dataset(size, n, rng)
    cfg = ThunderConfig(
        mode="3D", k=1, size=size, pixel_size=1.32,
        mask_radius=size * 1.32 / 2 * 0.9,
        trans_s=3.0, init_res=12.0, global_search_res=8.0, sym="C1",
        m_s=int(os.environ.get("PR_MS", 1024)),
        m_l_r=int(os.environ.get("PR_MLR", 32)),
        m_l_t=int(os.environ.get("PR_MLT", 16)),
        m_reco=int(os.environ.get("PR_MRECO", 16)),
        ignore_res=size * 1.32, trans_search_factor=0.1,
    )
    ctf = ctf_params(
        np.full(n, 300e3),
        rng.uniform(10000, 25000, n), rng.uniform(10000, 25000, n),
        rng.uniform(0, np.pi, n), np.full(n, 2.0e7), np.full(n, 0.1),
        np.zeros(n),
    )
    kwargs = {}
    if os.environ.get("PR_LOCAL"):
        # LOCAL-round profile: resume from converged poses (bench
        # run_local's regime — big search radius, tight clouds)
        from thunder_tpu.io.thu import ThuTable

        _vol, _imgs, _cc, quats, trans = make_dataset(size, n, rng)
        cfg.g_search = False
        thu = ThuTable.blank(n, voltage=300e3)
        thu.quat = quats
        thu.trans = trans
        thu.std_trans = np.full((n, 2), 0.3)
        thu.k1 = np.full(n, 3e-6)
        thu.k2 = np.full(n, 3e-6)
        thu.k3 = np.full(n, 3e-6)
        kwargs["resume_thu"] = thu
    opt = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64), init_refs=vol,
                    **kwargs)

    def sync():
        jax.block_until_ready(
            (opt.state.par.t, opt.state.refs, opt.state.sigma,
             opt.data.ft_masked))

    def stage(name, fn):
        sync()
        t0 = time.time()
        out = fn()
        jax.block_until_ready(jax.tree.leaves(out) or [opt.state.par.t])
        sync()
        dt = time.time() - t0
        print(f"  {name:28s} {dt * 1e3:9.1f} ms")
        return out

    for rnd in range(2):
        print(f"--- round {rnd} ({'compile' if rnd == 0 else 'hot'}) ---")
        t_round = time.time()
        rings = opt._rings()
        from thunder_tpu.model import SEARCH_TYPE_GLOBAL

        if opt.model.search_type == SEARCH_TYPE_GLOBAL and cfg.g_search:
            g = stage("expectation_global", lambda: opt.expectation_global(rings))
            stage("adopt_global", lambda: opt.adopt_global(g))
        phases = stage("local_phases", lambda: opt.local_phases(rings))
        print(f"    (n_phases = {list(np.asarray(phases))})")
        s0 = np.asarray(opt.state.par.s0)[opt.valid]
        s1 = np.asarray(opt.state.par.s1)[opt.valid]
        opt.model.set_t_vari(float(np.median(s0)), float(np.median(s1)))
        if rnd != 0 and opt.model.search_type != SEARCH_TYPE_GLOBAL:
            stage("norm_correction", lambda: opt.norm_correction())
        stage("refresh_sigma", lambda: opt.refresh_sigma())
        out = stage("insert (reconstruct_round)", lambda: opt.reconstruct_round())
        f2, t2, r_u, grid_size = out

        import jax.numpy as jnp
        from thunder_tpu.optimiser import _reconstruct_all_h, _compare_refs

        fsc_prev = np.asarray(opt.model.fsc, dtype=np.float32)
        if fsc_prev.shape[0] < cfg.k:
            fsc_prev = np.broadcast_to(fsc_prev[:1], (cfg.k,) + fsc_prev.shape[1:])
        refs = stage("reconstruct (balance loop)", lambda: _reconstruct_all_h(
            f2, t2, jnp.asarray(fsc_prev), grid_size, cfg.pf, r_u,
            True, False, True, cfg.size))
        opt.state.refs = refs
        fsc_dev = stage("compare_refs (FSC+avg)", lambda: _compare_refs(
            opt.state.refs[0], opt.state.refs[1], cfg.max_r))
        opt.model.set_fsc(np.asarray(fsc_dev[0]))
        opt.model.update_res(cfg.thres_report_fsc)
        stage("solvent_flatten", lambda: opt.solvent_flatten(False))
        stage("re_centre+remask", lambda: (opt.re_centre_img(),
                                           opt._refresh_masked()))
        opt.model.update_r(cfg.thres_cutoff_fsc)
        opt.model.update_search_type()
        sync()
        print(f"  round total: {time.time() - t_round:.2f} s "
              f"({n / (time.time() - t_round):.1f} img/s)")


if __name__ == "__main__":
    main()
