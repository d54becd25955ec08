"""Diagnose the brick-mode local-round regression seen in BENCH_r03.

Runs the bench's run_local scenario but for 5 timed rounds, printing
per-round proj_table + seconds, plus a separate timing of the brick
table build alone (the per-round `_proj_stack` cost).

    python scripts/diag_brick.py [size]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = 256
    bench._enable_compile_cache()
    from thunder_tpu.config import ThunderConfig
    from thunder_tpu.io.thu import ThuTable
    from thunder_tpu.optimiser import Optimiser
    from thunder_tpu.physics.ctf import ctf_params

    rng = np.random.default_rng(0)
    vol, imgs, ctf_cols, quats, trans = bench.make_dataset(size, n, rng)

    cfg = ThunderConfig(
        mode="3D", k=1, size=size, pixel_size=1.32,
        mask_radius=size * 1.32 / 2 * 0.9,
        trans_s=3.0, init_res=12.0, global_search_res=8.0, sym="C1",
        m_s=10000, m_l_r=125, m_l_t=9, m_reco=100,
        ignore_res=size * 1.32, trans_search_factor=0.1,
        g_search=False,
    )
    ctf = ctf_params(*ctf_cols)
    thu = ThuTable.blank(n, voltage=300e3)
    thu.quat = quats
    thu.trans = trans
    thu.std_trans = np.full((n, 2), 0.3)
    thu.k1 = np.full(n, 3e-6)
    thu.k2 = np.full(n, 3e-6)
    thu.k3 = np.full(n, 3e-6)
    opt = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64), init_refs=vol,
                    resume_thu=thu)
    print(f"warm-up round (size={size})...", flush=True)
    opt.run_round(0)
    for i in range(1, 6):
        t0 = time.time()
        rec = opt.run_round(i)
        dt = time.time() - t0
        print(f"round {i}: {dt:7.2f}s  {n/dt:7.1f} img/s  "
              f"table={rec.get('proj_table')}  r={rec.get('r')}  "
              f"st={rec.get('search_type')}  "
              f"phases={rec.get('n_phases')}", flush=True)


if __name__ == "__main__":
    main()
