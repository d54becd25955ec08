"""Generate a self-contained synthetic demo dataset + config.

    python examples/make_synthetic_demo.py [outdir] [--mode 2D|3D]
        [--n 1024] [--size 64] [--k 3]

Then run the full workflow:

    python -m thunder_tpu.cli.thunder <outdir>/demo.json
    python -m thunder_tpu.cli.stackview show -i <outdir>/output/Reference_Round_000.mrcs -o classes.png
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("outdir", nargs="?", default="./synthetic_demo")
    p.add_argument("--mode", default="2D", choices=["2D", "3D"])
    p.add_argument("--n", type=int, default=1024)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--snr", type=float, default=3.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sym", default="C1",
                   help="3D point-group symmetry (Cn/Dn/T/O/I): the "
                        "phantom is symmetrized over the group and the "
                        "emitted config carries the Symmetry key, so "
                        "parity runs exercise the reference's symmetric "
                        "workload (script/demo_3D.json uses C4)")
    p.add_argument("--ctf-error", type=float, default=0.0,
                   help="simulate CTF estimation error: the images are "
                        "formed with the TRUE defocus but the .thu "
                        "records defocus/(1+ctf_error), and the emitted "
                        "config turns CTF Search on — the defocus-factor "
                        "search should recover d ~ 1+ctf_error "
                        "(reference: demo.json CTF Search workload)")
    a = p.parse_args()

    import jax
    # data generation is host work; the tunneled TPU backend lacks
    # eager complex ops (UNIMPLEMENTED) and would be slower anyway
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from thunder_tpu.geometry.quaternion import random_quat, rotate3d
    from thunder_tpu.io.mrc import write_mrc
    from thunder_tpu.io.thu import ThuTable, write_thu
    from thunder_tpu.ops.fourier import ifft2_centered, translate_ft
    from thunder_tpu.ops.projector import prepare_projectee_3d, project_full_3d
    from thunder_tpu.physics.ctf import ctf_image, ctf_params

    os.makedirs(a.outdir, exist_ok=True)
    rng = np.random.default_rng(a.seed)
    size, n, k = a.size, a.n, a.k
    c = size // 2
    kv = np.arange(size) - c

    defocus = rng.uniform(8000, 20000, n)
    params = ctf_params(np.full(n, 300e3), defocus, defocus * rng.uniform(0.9, 1.1, n),
                        rng.uniform(0, np.pi, n), np.full(n, 2e7),
                        np.full(n, 0.1), np.zeros(n))
    truth = rng.integers(0, k, n)
    trans = rng.uniform(-3, 3, (n, 2))

    if a.mode == "2D":
        ky, kx = np.meshgrid(kv, kv, indexing="ij")
        rr = np.hypot(kx, ky)
        temps = []
        for t in range(k):
            img = np.zeros((size, size), np.float32)
            if t % 3 == 0:
                # bar: blobs along one axis (elongated second moment)
                for ox in np.linspace(-size / 4, size / 4, 5):
                    img += np.exp(-((kx - ox) ** 2 + ky ** 2)
                                  / (2 * (size / 16) ** 2))
            elif t % 3 == 1:
                # annulus: mass at a fixed radius, all angles
                img = np.exp(-((rr - size / 4) ** 2)
                             / (2 * (size / 20) ** 2)).astype(np.float32)
            else:
                # compact disc: mass concentrated at the centre
                img = np.exp(-(rr ** 2) / (2 * (size / 10) ** 2)
                             ).astype(np.float32)
            # per-class high-frequency texture on top of the gross shape
            for _ in range(3):
                ox, oy = rng.uniform(-size / 5, size / 5, 2)
                s = rng.uniform(size / 28, size / 16)
                img += 0.6 * np.exp(-((kx - ox) ** 2 + (ky - oy) ** 2)
                                    / (2 * s * s))
            temps.append(img.astype(np.float32))
        from scipy.ndimage import rotate, shift

        ctf_imgs = np.asarray(ctf_image(params, size, 1.32))
        imgs = np.empty((n, size, size), np.float32)
        for i in range(n):
            im = rotate(temps[truth[i]], rng.uniform(0, 360), reshape=False,
                        order=1)
            im = shift(im, trans[i], order=1)
            # internal FFT layout -> centered spectrum -> apply CTF
            im_fft = np.fft.ifftshift(im)
            ft = np.fft.fftshift(np.fft.fft2(im_fft)) * ctf_imgs[i]
            im_fft = np.real(np.fft.ifft2(np.fft.ifftshift(ft)))
            imgs[i] = (im_fft * a.snr / max(im_fft.std(), 1e-9)
                       + rng.standard_normal((size, size))).astype(np.float32)
        # imgs are in internal layout; write_mrc shifts to file layout
        write_mrc(os.path.join(a.outdir, "particles.mrcs"), imgs, 1.32,
                  is_stack=True)
    else:
        kz, ky, kx = np.meshgrid(kv, kv, kv, indexing="ij")
        # K distinct 3D phantoms for classification parity (the
        # reference's demo_3D.json is K=4 classification from ONE init
        # model, script/demo_3D.json); K=1 keeps the refine workload
        phantoms = []
        rr3 = np.sqrt(kx ** 2 + ky ** 2 + kz ** 2)
        for _t in range(k):
            vol = np.zeros((size,) * 3, np.float32)
            if k > 1:
                # gross per-class shape distinguishable at low
                # resolution (the 2D generator's bar/annulus/disc
                # analogues): rod / shell / ball
                if _t % 3 == 0:
                    for ox in np.linspace(-size / 4, size / 4, 5):
                        vol += np.exp(-((kx - ox) ** 2 + ky ** 2
                                        + kz ** 2)
                                      / (2 * (size / 16) ** 2))
                elif _t % 3 == 1:
                    vol += np.exp(-((rr3 - size / 5) ** 2)
                                  / (2 * (size / 20) ** 2))
                else:
                    vol += np.exp(-(rr3 ** 2) / (2 * (size / 10) ** 2))
            # per-class texture on top (sole content at K=1)
            for _ in range(6):
                o = rng.uniform(-size / 6, size / 6, 3)
                s = rng.uniform(size / 24, size / 10)
                vol += (0.6 if k > 1 else 1.0) * np.exp(
                    -(((kx - o[0]) ** 2 + (ky - o[1]) ** 2
                       + (kz - o[2]) ** 2) / (2 * s * s)))
            if a.sym.upper() != "C1":
                # make the truth genuinely symmetric: average the
                # phantom over the group's rotations (otherwise a
                # symmetric refinement of an asymmetric object tests
                # nothing)
                from scipy.ndimage import affine_transform

                from thunder_tpu.geometry.symmetry import Symmetry

                sym = Symmetry(a.sym)
                srots = np.asarray(rotate3d(jnp.asarray(sym.quats)))
                acc = np.zeros_like(vol)
                centre = np.full(3, c, np.float64)
                for rm in srots:
                    # grid indexing is (z, y, x); rotation matrices act
                    # on (x, y, z) — conjugate by the axis flip
                    m = rm[::-1, ::-1].T
                    acc += affine_transform(
                        vol, m, offset=centre - m @ centre, order=1)
                vol = (acc / len(srots)).astype(np.float32)
            phantoms.append(vol)
        # one class-neutral init model (mean of the truths; the same
        # start drives BOTH frameworks so class separation, not init
        # quality, is under test) — identical to the phantom at K=1
        init = np.mean(phantoms, axis=0).astype(np.float32)
        write_mrc(os.path.join(a.outdir, "init_model.mrc"),
                  np.fft.ifftshift(init), 1.32)
        projs = [prepare_projectee_3d(
            jnp.asarray(np.fft.ifftshift(ph)), 2) for ph in phantoms]
        quats = random_quat(jax.random.PRNGKey(a.seed), (n,))
        rots = rotate3d(quats)
        ctf_imgs = np.asarray(ctf_image(params, size, 1.32))
        imgs = np.empty((n, size, size), np.float32)
        if k == 1:
            truth = np.zeros(n, np.int64)
        for i in range(n):
            ft = project_full_3d(projs[truth[i]], rots[i])
            ft = translate_ft(ft, trans[i, 0], trans[i, 1]) * ctf_imgs[i]
            im = np.asarray(ifft2_centered(ft))
            imgs[i] = (im * a.snr / max(im.std(), 1e-9)
                       + rng.standard_normal((size, size))).astype(np.float32)
        write_mrc(os.path.join(a.outdir, "particles.mrcs"), imgs, 1.32,
                  is_stack=True)

    t = ThuTable.blank(n, voltage=300e3)
    if a.ctf_error and a.mode == "3D":
        # the CTF-search workload resumes from (near-)true poses with
        # Global Search off, so both frameworks traverse
        # LOCAL -> CTF_SEARCH quickly and the defocus factor is the
        # free variable under test
        t.quat = np.asarray(quats)
        t.trans = np.asarray(trans)
        t.std_trans = np.full((n, 2), 0.3)
        t.k1 = np.full(n, 3e-6)
        t.k2 = np.full(n, 3e-6)
        t.k3 = np.full(n, 3e-6)
    # with --ctf-error the IMAGES carry the true defocus (params) while
    # the .thu records a misestimated one; the defocus-factor search
    # (CTF Search) should recover d ~ 1+ctf_error on both frameworks
    t.defocus_u = np.asarray(params.defocus_u) / (1.0 + a.ctf_error)
    t.defocus_v = np.asarray(params.defocus_v) / (1.0 + a.ctf_error)
    t.defocus_theta = np.asarray(params.defocus_theta)
    t.cs = np.asarray(params.cs)
    t.amplitude_contrast = np.asarray(params.amplitude_contrast)
    t.particle_path = [f"{i + 1:06d}@particles.mrcs" for i in range(n)]
    t.class_id = truth
    write_thu(os.path.join(a.outdir, "particles.thu"), t)
    np.save(os.path.join(a.outdir, "truth.npy"), truth)

    # the FULL reference key set (appsrc/thunder.cpp:119-218 errors hard
    # on any missing key), so the same config drives both this framework
    # and the reference binary for E2E parity runs
    config = {
        "Basic": {
            "Number of Threads Per Process": os.cpu_count() or 4,
            "2D or 3D Mode": a.mode,
            "Global Search": not (a.ctf_error and a.mode == "3D"),
            "Local Search": True,
            "CTF Search": a.ctf_error != 0.0,
            "Number of Classes": k,
            "Size of Image": size,
            "Pixel Size (Angstrom)": 1.32,
            "Radius of Mask on Images (Angstrom)": size * 1.32 / 2 * 0.85,
            "Estimated Translation (Pixel)": 4,
            "Initial Resolution (Angstrom)": size * 1.32 / 6,
            "Perform Global Search Under (Angstrom)": size * 1.32 / 12,
            "Symmetry": a.sym.upper(),
            "Initial Model": (os.path.join(a.outdir, "init_model.mrc")
                              if a.mode == "3D" else ""),
            ".thu File Storing Paths and CTFs of Images":
                os.path.join(a.outdir, "particles.thu"),
            "Path of Particles": a.outdir + "/",
            "Path of Output": os.path.join(a.outdir, "output") + "/",
            "Prefix of Output": "",
            "Calculate FSC Using Core Region": False,
            "Calculate FSC Using Masked Region": False,
            "Particle Grading": False,
            "Auto-Recentre Reference": True,
        },
        "Reference Mask": {
            "Perform Reference Mask": False,
            "Perform Reference Mask During Global Search": False,
            "Provided Mask": "",
        },
        "Subtract": {
            "Subtract Masked Region Reference From Images": False,
            "Region Need to Be Centred": "",
        },
        "Advanced": {
            "Max Number of Iteration": 20,
            "Using Golden Standard FSC": True,
            "Padding Factor": 2,
            "MKB Kernel Radius": 1.9,
            "MKB Kernel Smooth Factor": 15.0,
            "Number of Sampling Points for Scanning in Global Search (2D)": 100,
            "Number of Sampling Points for Scanning in Global Search (3D)": 4096,
            "Number of Sampling Points of Rotation in Local Search (2D)": 9,
            "Number of Sampling Points of Rotation in Local Search (3D)": 64,
            "Number of Sampling Points of Translation in Local Search": 9,
            "Number of Sampling Points of Defocus in Local Search": 9,
            "Number of Sampling Points Used in Reconstruction": 50,
            "Ignore Signal Under (Angstrom)": size * 1.32,
            "Correct Intensity Scale Using Signal Under (Angstrom)": 40.0,
            "FSC Threshold for Cutoff Frequency": 0.143,
            "FSC Threshold for Reporting Resolution": 0.143,
            "FSC Threshold for Scale Correction": 0.75,
            "Grouping when Calculating Sigma": True,
            "Grouping when Correcting Intensity Scale": False,
            "Mask Images with Zero Noise": True,
            "CTF Refine Standard Deviation": 0.01,
            "Save Reference(s) Each Iteration": True,
            "Save .thu File Each Iteration": True,
        },
        "Professional": {
            "Translation Search Factor": 0.25,
            "Perturbation Factor (Large)": 0.8,
            "Perturbation Factor (Small, Global)": 0.8,
            "Perturbation Factor (Small, Local)": 0.8,
            "Perturbation Factor (Small, CTF)": 0.8,
            "Skip Expectation": False,
            "Skip Maximization": False,
            "Skip Reconstruction": False,
        },
    }
    with open(os.path.join(a.outdir, "demo.json"), "w") as f:
        json.dump(config, f, indent=2)
    print(f"wrote {a.outdir}: particles.mrcs, particles.thu, demo.json")


if __name__ == "__main__":
    main()
