"""Demo-scale integration run: 160px box, K classes, thousands of
particles — the reference demo_2D.json shape on synthetic data.

    python scripts/demo_scale_run.py [n_particles] [k] [rounds]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from bench import _enable_compile_cache

    _enable_compile_cache()

    import jax
    from thunder_tpu.config import ThunderConfig
    from thunder_tpu.optimiser import Optimiser
    from thunder_tpu.physics.ctf import ctf_params, ctf_image
    from thunder_tpu.physics.mask import radial_grid

    size, ps = 160, 1.32
    rng = np.random.default_rng(0)

    # K synthetic class templates: random blob constellations
    c = size // 2
    kk = np.arange(size) - c
    ky, kx = np.meshgrid(kk, kk, indexing="ij")
    templates = []
    for t in range(k):
        img = np.zeros((size, size), np.float32)
        for _ in range(4 + t % 3):
            ox, oy = rng.uniform(-20, 20, 2)
            s = rng.uniform(4, 9)
            img += np.exp(-((kx - ox) ** 2 + (ky - oy) ** 2) / (2 * s * s))
        templates.append(np.fft.ifftshift(img))
    templates = np.stack(templates)

    truth = rng.integers(0, k, n)
    from scipy.ndimage import rotate, shift

    print(f"synthesizing {n} particles at {size}px ...", flush=True)
    imgs = np.empty((n, size, size), np.float32)
    for i in range(n):
        im = np.fft.fftshift(templates[truth[i]])
        im = rotate(im, rng.uniform(0, 360), reshape=False, order=1)
        im = shift(im, rng.uniform(-6, 6, 2), order=1)
        imgs[i] = np.fft.ifftshift(im) * 3 + rng.standard_normal(
            (size, size)
        ).astype(np.float32)

    cfg = ThunderConfig(
        mode="2D", k=k, size=size, pixel_size=ps, mask_radius=80.0,
        trans_s=10.0, init_res=60.0, global_search_res=15.0, sym="C1",
        m_s_2d=100, m_l_r_2d=9, m_l_t=9, m_reco=50,
        ignore_res=200.0, trans_search_factor=0.25,
    )
    ctf = ctf_params(
        np.full(n, 300e3), rng.uniform(10000, 25000, n),
        rng.uniform(10000, 25000, n), rng.uniform(0, np.pi, n),
        np.full(n, 2e7), np.full(n, 0.1), np.zeros(n),
    )
    opt = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64))

    for i in range(rounds):
        t0 = time.time()
        rec = opt.run_round(i)
        cls = opt.class_assignments()
        # purity: fraction of each predicted class's majority truth label
        purity = 0.0
        for t in range(k):
            sel = cls == t
            if sel.sum():
                purity += np.bincount(truth[sel]).max()
        purity /= n
        print(
            f"round {i}: {time.time() - t0:7.1f}s  r={rec['r']} "
            f"phases={rec['n_phases']} purity={purity:.3f} "
            f"({n / rec['elapsed_s']:.1f} img/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
