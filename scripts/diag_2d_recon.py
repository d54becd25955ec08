"""Isolated 2D reconstruction probe: noise-free images at KNOWN poses,
point-mass particle clouds pinned to the truth, one reconstruct call —
how sharp is the class average our insert+Wiener machinery returns?

    python scripts/diag_2d_recon.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from scipy.ndimage import rotate, shift

    from scripts.diag_2d_poses import ring_fsc, crossing
    from thunder_tpu.config import ThunderConfig
    from thunder_tpu.optimiser import Optimiser
    from thunder_tpu.physics.ctf import ctf_params

    size, n = 32, 64
    rng = np.random.default_rng(0)
    kv = np.arange(size) - size // 2
    ky, kx = np.meshgrid(kv, kv, indexing="ij")
    tmpl = (np.exp(-((kx - size / 6) ** 2 + ky ** 2) / (2 * (size / 12) ** 2))
            + 0.8 * np.exp(-((kx + size / 8) ** 2 + (ky - size / 7) ** 2)
                           / (2 * (size / 16) ** 2))).astype(np.float32)
    # broadband texture (sigma ~ 1 px -> flat spectrum to Nyquist) so
    # the probe can judge every shell, windowed inside the mask radius
    for _ in range(40):
        ox, oy = rng.uniform(-size / 3, size / 3, 2)
        tmpl += 0.3 * np.exp(-((kx - ox) ** 2 + (ky - oy) ** 2) / 2.0)
    tmpl *= np.exp(-(kx ** 2 + ky ** 2) / (2 * (size / 4) ** 2)).astype(
        np.float32)

    ang = rng.uniform(0, 360, n)
    tr = rng.uniform(-2, 2, (n, 2))
    if os.environ.get("DIAG_ZERO_ANG"):
        ang[:] = 0.0
    if os.environ.get("DIAG_ZERO_TR"):
        tr[:] = 0.0
    # forward model through OUR OWN projector (no scipy conventions in
    # the loop): imgs_i = IFFT(Translate(Project(tmpl, R(phi_i)), t_i))
    from thunder_tpu.geometry.quaternion import rotate2d_from_unit
    from thunder_tpu.ops.fourier import ifft2_centered, translate_ft
    from thunder_tpu.ops.projector import (
        prepare_projectee_2d,
        project_full_2d,
    )

    tmpl_i = np.fft.ifftshift(tmpl)
    proj = prepare_projectee_2d(jnp.asarray(tmpl_i), pf=2)
    phi = np.radians(ang)
    units = jnp.asarray(np.stack([np.cos(phi), np.sin(phi)], -1),
                        jnp.float32)
    rots = rotate2d_from_unit(units)
    from thunder_tpu.physics.ctf import ctf_image

    params_fwd = ctf_params(
        np.full(n, 300e3), np.full(n, 2000.0), np.full(n, 2000.0),
        np.zeros(n), np.zeros(n), np.full(n, 0.1), np.zeros(n))
    ctf_imgs = np.asarray(ctf_image(params_fwd, size, 1.0))
    imgs = np.stack([
        np.asarray(ifft2_centered(translate_ft(
            project_full_2d(proj, rots[i]), tr[i, 0], tr[i, 1])
            * ctf_imgs[i]))
        for i in range(n)]).astype(np.float32)

    init_res = float(os.environ.get("DIAG_INIT_RES", 4.0))
    cfg = ThunderConfig(
        mode="2D", k=1, size=size, pixel_size=1.0,
        mask_radius=size * 0.45, trans_s=2.0,
        init_res=init_res, global_search_res=4.0,
        m_s=64, m_l_r=9, m_l_t=5, m_reco=8,
        ignore_res=float(size), perform_mask=False,
        save_refs_each_iter=False, save_thu_each_iter=False,
        ref_auto_recentre=False,
    )
    params = ctf_params(
        np.full(n, 300e3), np.full(n, 2000.0), np.full(n, 2000.0),
        np.zeros(n), np.zeros(n), np.full(n, 0.1), np.zeros(n))
    opt = Optimiser(cfg, imgs, params, np.zeros(n, np.int64))
    if os.environ.get("DIAG_GRID_FULL"):
        opt._reco_grid_size = lambda r_u: size

    # pin every particle-filter support point to the truth pose.
    # internal angle convention: quat[:2] = (cos phi, sin phi); probe
    # BOTH signs of phi to establish the convention empirically.
    s = opt.state
    for sign in (+1, -1):
        par = s.par
        phi = np.radians(sign * ang)
        q = np.zeros((n, 4), np.float32)
        q[:, 0] = np.cos(phi)
        q[:, 1] = np.sin(phi)
        qh = np.zeros((2,) + par.r.shape[1:], np.float32)   # (2,L,nR,4)
        th = np.zeros((2,) + par.t.shape[1:], np.float32)
        top_r = np.zeros((2,) + par.top_r.shape[1:], np.float32)
        top_t = np.zeros((2,) + par.top_t.shape[1:], np.float32)
        for h in (0, 1):
            v = opt.valid[h]
            idx = opt.index[h]
            qh[h] = q[idx][:, None, :].repeat(par.r.shape[2], axis=1)
            # truth trans: the image was SHIFTED by tr; alignment's t
            # convention: probe both signs below via sign_t
            th[h] = tr[idx][:, None, :].repeat(par.t.shape[2], axis=1)
            top_r[h] = q[idx]
            top_t[h] = tr[idx]
        for sign_t in (+1, -1):
            s.par = par._replace(
                r=jnp.asarray(qh), t=jnp.asarray(sign_t * th),
                top_r=jnp.asarray(top_r),
                top_t=jnp.asarray(sign_t * top_t),
                w_r=jnp.ones_like(par.w_r) / par.w_r.shape[2],
                w_t=jnp.ones_like(par.w_t) / par.w_t.shape[2],
                w_d=jnp.ones_like(par.w_d) / par.w_d.shape[2],
            )
            f2, t2, r_u, grid_size = opt.reconstruct_round()
            if sign == 1 and sign_t == 1:
                print(f"r_u={r_u} grid_size={grid_size}")
            fsc1 = np.ones((cfg.k, cfg.max_r), np.float32)
            refs = np.asarray(opt._reconstruct_refs(
                f2, t2, fsc1, grid_size, r_u, False, False, True))
            corr = [np.corrcoef(refs[h, 0].ravel(), tmpl_i.ravel())[0, 1]
                    for h in (0, 1)]
            ra = np.fft.fftshift(refs[0, 0])
            print(f"sign_ang={sign:+d} sign_t={sign_t:+d} "
                  f"corr(ref, tmpl)={np.round(corr, 4).tolist()} "
                  f"hemiAB shell={crossing(ring_fsc(refs[0, 0], refs[1, 0]))} "
                  f"vs-tmpl shell={crossing(ring_fsc(ra, tmpl))}",
                  flush=True)
            if sign == 1 and sign_t == -1:
                # per-shell amplitude ratio + correlation vs truth:
                # ratio << 1 -> damping (blur); ratio ~ 1 with low
                # corr -> geometric error
                fa = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(ra)))
                fb = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(tmpl)))
                kyv, kxv = np.meshgrid(kv, kv, indexing="ij")
                rr = np.round(np.hypot(kxv, kyv)).astype(int)
                for sh in range(1, size // 2):
                    m = rr == sh
                    amp = (np.sqrt(np.sum(np.abs(fa[m]) ** 2))
                           / max(np.sqrt(np.sum(np.abs(fb[m]) ** 2)),
                                 1e-12))
                    num = np.real(np.sum(fa[m] * np.conj(fb[m])))
                    den = (np.sqrt(np.sum(np.abs(fa[m]) ** 2))
                           * np.sqrt(np.sum(np.abs(fb[m]) ** 2)))
                    print(f"   shell {sh:2d}: amp_ratio={amp:7.3f} "
                          f"corr={num / max(den, 1e-12):6.3f}")


if __name__ == "__main__":
    main()
