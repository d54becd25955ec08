"""Controlled 2D pose-recovery experiment: K=1, one asymmetric
template, KNOWN angles/translations — measures our 2D expectation
step's recovery error directly (the 2D parity gap diagnostic).

    python scripts/diag_2d_recover.py [--size 32] [--n 64] [--iters 4]
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _hi_power(img):
    """Power in shells above half-Nyquist (blur detector)."""
    ft = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(img)))
    size = img.shape[0]
    kv = np.arange(size) - size // 2
    ky, kx = np.meshgrid(kv, kv, indexing="ij")
    r = np.hypot(kx, ky)
    return float(np.sum(np.abs(ft[(r > size / 8) & (r < size / 2)]) ** 2))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=32)
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--snr", type=float, default=3.0)
    p.add_argument("--trans", type=float, default=2.0)
    a = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from scipy.ndimage import rotate, shift

    from thunder_tpu.config import ThunderConfig
    from thunder_tpu.optimiser import Optimiser
    from thunder_tpu.physics.ctf import ctf_params, ctf_image

    size, n = a.size, a.n
    rng = np.random.default_rng(0)
    kv = np.arange(size) - size // 2
    ky, kx = np.meshgrid(kv, kv, indexing="ij")
    # asymmetric template: offset blobs, no rotational symmetry
    tmpl = (np.exp(-((kx - size / 6) ** 2 + ky ** 2) / (2 * (size / 12) ** 2))
            + 0.8 * np.exp(-((kx + size / 8) ** 2 + (ky - size / 7) ** 2)
                           / (2 * (size / 16) ** 2))
            + 0.6 * np.exp(-((kx + size / 10) ** 2 + (ky + size / 5) ** 2)
                           / (2 * (size / 20) ** 2))).astype(np.float32)

    ang_true = rng.uniform(0, 360, n)
    trans_true = rng.uniform(-a.trans, a.trans, (n, 2))
    params = ctf_params(
        np.full(n, 300e3), rng.uniform(8000, 20000, n),
        rng.uniform(8000, 20000, n), rng.uniform(0, np.pi, n),
        np.full(n, 2e7), np.full(n, 0.1), np.zeros(n))
    ctf_imgs = np.asarray(ctf_image(params, size, 1.32))
    imgs = np.empty((n, size, size), np.float32)
    for i in range(n):
        im = rotate(tmpl, ang_true[i], reshape=False, order=1)
        im = shift(im, trans_true[i], order=1)
        ft = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(im))) * ctf_imgs[i]
        im = np.real(np.fft.ifft2(np.fft.ifftshift(ft)))
        imgs[i] = (im * a.snr / max(im.std(), 1e-9)
                   + rng.standard_normal((size, size))).astype(np.float32)

    cfg = ThunderConfig(
        mode="2D", k=1, size=size, pixel_size=1.32,
        mask_radius=size * 1.32 / 2 * 0.85, trans_s=2.0,
        init_res=size * 1.32 / 4, global_search_res=size * 1.32 / 8,
        m_s=1000, m_l_r=9, m_l_t=5, m_reco=8,
        ignore_res=size * 1.32,
        perform_mask=False, save_refs_each_iter=False,
        save_thu_each_iter=False,
    )
    from thunder_tpu.io.thu import ThuTable

    from scripts.diag_2d_poses import ring_fsc, crossing

    opt = Optimiser(cfg, imgs, params, np.zeros(n, np.int64))
    base = ThuTable.blank(n, voltage=300e3)
    for i in range(a.iters):
        rec = opt.run_round(i)
        thu = opt.export_thu(base)
        # internal hemisphere references: real-space (2, K, s, s).
        # compare with the pose-built average from the SAME poses
        refs = np.asarray(opt.state.refs)
        ang_i = np.degrees(np.arctan2(thu.quat[:, 1], thu.quat[:, 0]))
        acc = np.zeros((2, size, size))
        for j in range(n):
            im = shift(imgs[j], -thu.trans[j], order=1)
            acc[j % 2] += rotate(im, ang_i[j], reshape=False, order=1)
        acc /= n / 2
        print(f"  refs[A]-vs-refs[B] shell="
              f"{crossing(ring_fsc(refs[0, 0], refs[1, 0]))} "
              f"pose-avg[A]-vs-[B] shell="
              f"{crossing(ring_fsc(acc[0], acc[1]))} "
              f"refs[A]-vs-poseavg[A] shell="
              f"{crossing(ring_fsc(refs[0, 0], acc[0]))} "
              f"ref-power-ratio(hi)="
              f"{_hi_power(refs[0, 0]) / max(_hi_power(acc[0]), 1e-12):.3f}",
              flush=True)
        # internal 2D convention: (w, x) = (cos phi, sin phi)
        ang = np.degrees(np.arctan2(thu.quat[:, 1], thu.quat[:, 0]))
        # the recovered reference may sit at a global rotation/shift
        # offset from the truth template: report the SPREAD of the
        # per-image error (median absolute deviation from the circular
        # median), which a global offset does not affect
        err = (ang - ang_true + 180) % 360 - 180
        ce = np.exp(1j * np.radians(err))
        mu = np.angle(ce.mean())
        dev = np.degrees(np.angle(ce * np.exp(-1j * mu)))
        terr = thu.trans - trans_true
        tdev = terr - terr.mean(0)
        print(f"round {i}: res={rec.get('res_A', 0):.2f}A "
              f"ang dev med={np.median(np.abs(dev)):.2f} deg "
              f"p90={np.quantile(np.abs(dev), .9):.2f} "
              f"|trans dev| med={np.median(np.linalg.norm(tdev, axis=1)):.2f} px "
              f"p90={np.quantile(np.linalg.norm(tdev, axis=1), .9):.2f}",
              flush=True)


if __name__ == "__main__":
    main()
