"""Per-stage wall-time breakdown of an E-M round on the current backend.

    python scripts/profile_stages.py [size] [n_images]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import jax
    from thunder_tpu.config import ThunderConfig
    from thunder_tpu.optimiser import Optimiser
    from thunder_tpu.physics.ctf import ctf_params
    from bench import make_dataset, _enable_compile_cache

    _enable_compile_cache()

    rng = np.random.default_rng(0)
    vol, imgs, _ctf_cols, _quats, _trans = make_dataset(size, n, rng)
    cfg = ThunderConfig(
        mode="3D", k=1, size=size, pixel_size=1.32,
        mask_radius=size * 1.32 / 2 * 0.9,
        trans_s=3.0, init_res=12.0, global_search_res=8.0, sym="C1",
        m_s=2048, m_l_r=64, m_l_t=16, m_reco=16,
        ignore_res=size * 1.32, trans_search_factor=0.1,
    )
    ctf = ctf_params(
        np.full(n, 300e3), rng.uniform(10000, 25000, n),
        rng.uniform(10000, 25000, n), rng.uniform(0, np.pi, n),
        np.full(n, 2.0e7), np.full(n, 0.1), np.zeros(n),
    )
    opt = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64), init_refs=vol)
    opt.run_round(0)  # compile

    rings = opt._rings()
    times = {}

    def stage(name, fn):
        # run once to absorb any fresh compiles, then time the rerun
        out = fn()
        jax.block_until_ready(jax.tree.leaves(out) or [0])
        t0 = time.time()
        out = fn()
        jax.block_until_ready(jax.tree.leaves(out) or [0])
        times[name] = time.time() - t0
        return out

    g = stage("global_search", lambda: opt.expectation_global(0, rings))
    stage("adopt", lambda: opt.adopt_global(0, g))
    stage("phase_loop", lambda: opt.local_phases(0, rings))
    stage("sigma", lambda: opt.refresh_sigma(0))
    pairs_ru = stage("insert", lambda: opt.reconstruct_round(0))
    pairs, r_u, grid_size = pairs_ru
    from thunder_tpu.recon.reconstructor import reconstruct
    import jax.numpy as jnp

    stage("reconstruct", lambda: reconstruct(
        pairs[0][0], pairs[0][1], jnp.ones(cfg.max_r), grid_size, cfg.pf, r_u
    ))
    total = sum(times.values())
    for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{k:15s} {v:8.3f}s  {100 * v / total:5.1f}%")
    print(f"{'total':15s} {total:8.3f}s (one hemisphere, {n // 2} images)")


if __name__ == "__main__":
    main()
