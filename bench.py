"""Benchmark: particle-images/sec/chip for one full E-M round of 3D
refinement on synthetic data (the BASELINE.json metric).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline is measured against the V100 CUDA reference path's
throughput.  The reference publishes no numbers (BASELINE.md); until a
measured reference baseline lands in BASELINE.md we use the demo-scale
estimate of ~100 particle-images/sec/V100 for a 3D refine round at this
box size (conservative reading of the GPU-workstation recipe,
docs/README.md:233).
"""

import json
import os
import sys
import time

import numpy as np

ASSUMED_V100_IMG_PER_SEC = 100.0


def _enable_compile_cache():
    """Persistent compilation cache: first-ever bench run pays the
    (slow, remote) compiles; subsequent runs start hot."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def make_dataset(size, n, rng):
    from thunder_tpu.physics.mask import radial_grid

    u = np.asarray(radial_grid(size, 3))
    vol = (np.exp(-((u / (size / 8.0)) ** 2))
           + 0.5 * np.exp(-(((u - size / 6) / (size / 16.0)) ** 2))).astype(np.float32)

    # analytic projections are not needed: noisy images suffice for a
    # throughput benchmark (math is identical regardless of content)
    imgs = rng.standard_normal((n, size, size)).astype(np.float32)
    c = size // 2
    k = np.arange(size) - c
    ky, kx = np.meshgrid(k, k, indexing="ij")
    blob = np.fft.ifftshift(np.exp(-((kx**2 + ky**2) / (2 * (size / 6) ** 2))))
    imgs += 3.0 * blob[None]
    return vol, imgs


def run(size=128, n=256):
    """One timed 3D-refine E-M round at the DEMO-GRADE search grid
    (mS=10000, mLR=125, mLT=9, mReco=100 — the reference's
    script/demo_3D.json workload), not a lightened grid."""
    import jax

    _enable_compile_cache()
    from thunder_tpu.config import ThunderConfig
    from thunder_tpu.optimiser import Optimiser
    from thunder_tpu.physics.ctf import ctf_params

    rng = np.random.default_rng(0)
    vol, imgs = make_dataset(size, n, rng)

    cfg = ThunderConfig(
        mode="3D", k=1, size=size, pixel_size=1.32,
        mask_radius=size * 1.32 / 2 * 0.9,
        trans_s=3.0, init_res=12.0, global_search_res=8.0, sym="C1",
        m_s=10000, m_l_r=125, m_l_t=9, m_reco=100,
        ignore_res=size * 1.32, trans_search_factor=0.1,
    )
    ctf = ctf_params(
        np.full(n, 300e3),
        rng.uniform(10000, 25000, n), rng.uniform(10000, 25000, n),
        rng.uniform(0, np.pi, n), np.full(n, 2.0e7), np.full(n, 0.1),
        np.zeros(n),
    )
    opt = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64), init_refs=vol)

    # warm-up round compiles everything (persistent cache makes repeat
    # invocations start hot)
    print(f"bench {size}px: warm-up round (compiling)...",
          file=sys.stderr, flush=True)
    opt.run_round(0)
    print(f"bench {size}px: timing round...", file=sys.stderr, flush=True)
    t0 = time.time()
    opt.run_round(1)
    dt = time.time() - t0
    return n / dt, dt


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    try:
        ips, dt = run(size, n)
    except Exception as e:
        # retry once (the remote TPU worker occasionally restarts), then
        # fall back to a smaller box (e.g. HBM limits on small chips)
        print(f"bench: first attempt failed ({type(e).__name__}); retrying",
              file=sys.stderr, flush=True)
        try:
            ips, dt = run(size, n)
        except Exception:
            size, n = 64, 128
            ips, dt = run(size, n)
    extra = {}
    if size == 128:
        # the BASELINE.json north-star box, same demo-grade grid
        try:
            ips256, _ = run(256, n)
            extra["256px"] = {
                "value": round(ips256, 3),
                "vs_baseline": round(ips256 / ASSUMED_V100_IMG_PER_SEC, 3),
            }
        except Exception as e:
            extra["256px"] = {"error": type(e).__name__}
    print(json.dumps({
        "metric": (f"particle-images/sec/chip, full 3D-refine E-M round, "
                   f"{size}px box, demo-grade grid "
                   f"(mS=10000 mLR=125 mLT=9 mReco=100)"),
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / ASSUMED_V100_IMG_PER_SEC, 3),
        **extra,
    }))


if __name__ == "__main__":
    main()
