"""Instrumented rerun of the tpu side of the 2D parity workload:
per round, compare the INTERNAL hemisphere-FSC (what the parity table
scores) against split-half FSCs of class averages rebuilt from (a) the
rank-1 poses and (b) cloud DRAWS — separating 'alignment is bad' from
'reconstruction adds noise' from 'the cloud draws blur'.

    python scripts/diag_2d_parity_instr.py /tmp/parity2d_r4 [iters]
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def split_avg_fsc(imgs, ang_deg, trans, cls, k):
    from scipy.ndimage import rotate, shift

    from scripts.diag_2d_poses import ring_fsc, crossing

    size = imgs.shape[1]
    acc = np.zeros((k, 2, size, size))
    cnt = np.zeros((k, 2), int)
    for i in range(len(imgs)):
        im = shift(imgs[i], -trans[i], order=1)
        im = rotate(im, ang_deg[i], reshape=False, order=1)
        c = int(cls[i])
        acc[c, i % 2] += im
        cnt[c, i % 2] += 1
    avg = acc / np.maximum(cnt, 1)[:, :, None, None]
    return [crossing(ring_fsc(avg[c, 0], avg[c, 1])) for c in range(k)]


def main():
    wd = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from thunder_tpu.config import ThunderConfig
    from thunder_tpu.io.loader import load_images
    from thunder_tpu.io.thu import ThuTable, read_thu
    from thunder_tpu.optimiser import Optimiser, _draw_poses_h
    from thunder_tpu.physics.ctf import ctf_params
    from thunder_tpu.physics import spectrum

    cfg = ThunderConfig.from_json(os.path.join(wd, "demo.json"))
    cfg.save_refs_each_iter = False
    cfg.save_thu_each_iter = False
    thu = read_thu(cfg.db)
    rng = np.random.default_rng(cfg.seed)
    thu = thu.select(rng.permutation(len(thu)))
    ctf = ctf_params(thu.voltage, thu.defocus_u, thu.defocus_v,
                     thu.defocus_theta, thu.cs, thu.amplitude_contrast,
                     thu.phase_shift)
    images = load_images(thu, cfg.par_prefix)
    imgs_nat = np.fft.fftshift(np.asarray(images), axes=(1, 2))
    opt = Optimiser(cfg, images, ctf, thu.group_id - 1)
    base = ThuTable.blank(len(thu), voltage=300e3)
    for i in range(iters):
        rec = opt.run_round(i)
        fsc = opt.model.fsc
        internal = [spectrum.res_p(fsc[t], 0.143, 1, 1)
                    for t in range(cfg.k)]
        out = opt.export_thu(base)
        ang = np.degrees(np.arctan2(out.quat[:, 1], out.quat[:, 0]))
        top = split_avg_fsc(imgs_nat, ang, out.trans, out.class_id, cfg.k)
        # cloud draws: m_reco poses per image, averaged with the same
        # pipeline (subsampled to 8 draws for speed)
        key = jax.random.PRNGKey(123)
        quats, trans_d, _ = _draw_poses_h(
            jax.random.split(key, 2), opt.state.par, 8)
        off = np.asarray(opt.offset)
        dr_sh = []
        for d in range(8):
            qa, ta, ca, ia = [], [], [], []
            for h in (0, 1):
                v = opt.valid[h]
                qa.append(np.asarray(quats[h, :, d])[v])
                ta.append((np.asarray(trans_d[h, :, d]) - off[h])[v])
                ca.append(np.asarray(opt.state.cls[h])[v])
                ia.append(opt.index[h][v])
            idx = np.concatenate(ia)
            q = np.concatenate(qa)[np.argsort(idx)]
            t = np.concatenate(ta)[np.argsort(idx)]
            c = np.concatenate(ca)[np.argsort(idx)]
            angd = np.degrees(np.arctan2(q[:, 1], q[:, 0]))
            dr_sh.append(split_avg_fsc(imgs_nat, angd, t, c, cfg.k))
            if d >= 1:
                break
        print(f"round {i}: internal={internal} top-pose={top} "
              f"draw={dr_sh}", flush=True)

    # final-round stage bisection: same F/T, different reconstruction
    # flags -> which stage costs the shells?
    from scripts.diag_2d_poses import ring_fsc, crossing

    f2, t2, r_u, grid_size = opt.reconstruct_round()
    np.savez("/tmp/diag2d_ft.npz", f2=np.asarray(f2), t2=np.asarray(t2),
             r_u=r_u, grid_size=grid_size, size=cfg.size, pf=cfg.pf,
             k=cfg.k)
    fsc_prev = np.asarray(opt.model.fsc, dtype=np.float32)
    if fsc_prev.shape[0] < cfg.k:
        fsc_prev = np.broadcast_to(fsc_prev[:1],
                                   (cfg.k,) + fsc_prev.shape[1:])

    def hemi_shells(refs):
        refs = np.asarray(refs)
        return [crossing(ring_fsc(refs[0, c], refs[1, c]))
                for c in range(cfg.k)]

    for label, mw, gc in (("default(mw=F,gc=T)", False, True),
                          ("wiener", True, True),
                          ("no-balance(gc=F)", False, False)):
        refs = opt._reconstruct_refs(f2, t2, fsc_prev, grid_size, r_u,
                                     mw, False, gc)
        print(f"  recon[{label}]: hemi shells={hemi_shells(refs)}",
              flush=True)
    # poor man's recon: F / max(T, eps), no balance, no kernel corr
    import jax.numpy as jnp
    from thunder_tpu.ops.fourier import ifft2_centered

    t_real = np.asarray(jnp.real(t2))
    rec = np.asarray(f2) / np.maximum(t_real, 1e-3)
    big = rec.shape[-1]
    pm = np.stack([[np.real(np.asarray(ifft2_centered(
        jnp.asarray(rec[h, c]))))[::cfg.pf, ::cfg.pf][:cfg.size, :cfg.size]
        for c in range(cfg.k)] for h in (0, 1)])
    print(f"  recon[raw F/T]: hemi shells={hemi_shells(pm)} big={big}",
          flush=True)


if __name__ == "__main__":
    main()
