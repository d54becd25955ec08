"""Per-stage wall-clock profile of demo-grade E-M rounds on the real
chip, via the optimiser's built-in stage timing (THUNDER_STAGE_TIMING).

    python scripts/profile_demo.py [size] [n] [--local]

Round 0 warms the compile cache; the following rounds print their
stage_ms breakdown.
"""
import os
import sys

import numpy as np

os.environ["THUNDER_STAGE_TIMING"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    local = "--local" in sys.argv
    size = int(args[0]) if args else 128
    n = int(args[1]) if len(args) > 1 else 256

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
        g_search=not local,
    )
    ctf = ctf_params(*ctf_cols)
    kw = {}
    if local:
        thu = ThuTable.blank(n, voltage=300e3)
        thu.quat = quats
        thu.trans = trans
        thu.std_trans = np.full((n, 2), 0.3)
        thu.k1 = np.full(n, 3e-6)
        thu.k2 = np.full(n, 3e-6)
        thu.k3 = np.full(n, 3e-6)
        kw["resume_thu"] = thu
    opt = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64), init_refs=vol,
                    **kw)
    print(f"profile size={size} n={n} local={local}: warm-up...",
          flush=True)
    opt.run_round(0)
    for i in range(1, 4):
        rec = opt.run_round(i)
        ms = rec.get("stage_ms", {})
        total = rec["elapsed_s"]
        print(f"--- round {i}: {total:6.2f}s  {n/total:7.1f} img/s  "
              f"st={rec.get('search_type')} r={rec.get('r')} "
              f"phases={rec.get('n_phases')} "
              f"table={rec.get('proj_table', 'oct-half')}", flush=True)
        for k, v in sorted(ms.items(), key=lambda kv: -kv[1]):
            print(f"    {k:20s} {v:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
