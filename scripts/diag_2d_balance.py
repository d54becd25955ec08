"""Probe the 2D gridding-balance reconstruction on REAL parity-run
(F, T) grids (dumped by diag_2d_parity_instr.py -> /tmp/diag2d_ft.npz):
how does the hemisphere FSC react to the balance loop's knobs?

    python scripts/diag_2d_balance.py
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

    from scripts.diag_2d_poses import ring_fsc, crossing
    from thunder_tpu.recon.reconstructor import (
        balance_weights,
        finalize_reconstruction,
        wiener_filter_t,
        _quad_inside,
        _mkb_window,
        T_MIN,
    )

    z = np.load("/tmp/diag2d_ft.npz")
    f2, t2 = jnp.asarray(z["f2"]), jnp.asarray(z["t2"])
    r_u, size, pf, k = (int(z["r_u"]), int(z["size"]), int(z["pf"]),
                        int(z["k"]))
    big = f2.shape[-1]
    print(f"grids: f2 {f2.shape} r_u={r_u} size={size} big={big}")

    def hemi_shells(recon_fn):
        refs = np.stack([
            np.stack([np.asarray(recon_fn(f2[h, c], t2[h, c]))
                      for c in range(k)]) for h in (0, 1)])
        return [crossing(ring_fsc(refs[0, c], refs[1, c]))
                for c in range(k)]

    grid_size = big // pf

    def rec_balanced(f, t, a=1.9, alpha=10.0, wiener=None):
        t_real = jnp.real(t) if jnp.iscomplexobj(t) else t
        if wiener is not None:
            t_real = wiener_filter_t(t_real, jnp.asarray(wiener), pf,
                                     r_u, True)
        w = balance_weights(t_real, pf, r_u, a=a, alpha=alpha)
        return finalize_reconstruction(f, w, grid_size, pf, r_u, True)

    def rec_raw(f, t, floor):
        t_real = jnp.real(t) if jnp.iscomplexobj(t) else t
        quad = _quad_inside(big, 2, r_u * pf)
        w = jnp.where(quad, 1.0 / jnp.maximum(t_real, floor), 0.0)
        return finalize_reconstruction(f, w, grid_size, pf, r_u, True)

    t_med = float(np.median(np.asarray(jnp.real(t2))[
        np.asarray(_quad_inside(big, 2, r_u * pf))[None, None].repeat(
            2, 0).repeat(k, 1)]))
    print("median T inside radius:", t_med)
    print("balanced mkb(1.9,10):", hemi_shells(rec_balanced))
    for fl_frac in (1e-12, 1e-3, 1e-2, 0.1, 0.3):
        fl = t_med * fl_frac
        print(f"raw 1/max(T,{fl_frac}*medT):",
              hemi_shells(lambda f, t: rec_raw(f, t, fl)))
    # balance on T floored at a fraction of median (Wiener-const-like)
    def rec_bal_floor(f, t, fl):
        t_real = jnp.maximum(jnp.real(t) if jnp.iscomplexobj(t) else t,
                             fl)
        w = balance_weights(t_real, pf, r_u)
        return finalize_reconstruction(f, w, grid_size, pf, r_u, True)
    for fl_frac in (1e-2, 0.1, 0.3):
        fl = t_med * fl_frac
        print(f"balanced floor {fl_frac}*medT:",
              hemi_shells(lambda f, t: rec_bal_floor(f, t, fl)))


if __name__ == "__main__":
    main()
