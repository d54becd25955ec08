"""thunder_reconstruct rebuild: reconstruction from a .thu with known
poses (appsrc/thunder_reconstruct.cpp) — exercises IO + CTF + insertion +
gridding without the particle filter.

    python -m thunder_tpu.cli.reconstruct --thu meta.thu -o map.mrc \
        --size 160 --pixelsize 1.32 [--prefix ../Data/] [--sym C4]
"""

from __future__ import annotations

import argparse

import numpy as np
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser(prog="thunder_reconstruct")
    p.add_argument("--thu", required=True)
    p.add_argument("-o", required=True)
    p.add_argument("--size", type=int, required=True)
    p.add_argument("--pixelsize", type=float, required=True)
    p.add_argument("--prefix", default="")
    p.add_argument("--sym", default="C1")
    p.add_argument("--pf", type=int, default=2)
    p.add_argument("--no-ctf", action="store_true")
    a = p.parse_args(argv)

    from thunder_tpu.geometry import Symmetry
    from thunder_tpu.geometry.quaternion import rotate3d
    from thunder_tpu.io.loader import load_images
    from thunder_tpu.io.mrc import write_mrc
    from thunder_tpu.io.thu import read_thu
    from thunder_tpu.ops.fourier import (
        extract_packed,
        fft2_centered,
        pack_rings,
        translate_phases,
    )
    from thunder_tpu.ops.insert import (
        hermitianize,
        hermitianize_real,
        insert_slices_3d,
    )
    from thunder_tpu.physics.ctf import ctf_packed, ctf_params
    from thunder_tpu.recon.reconstructor import reconstruct, symmetrize_ft

    thu = read_thu(a.thu)
    size, pf = a.size, a.pf
    imgs = load_images(thu, a.prefix)
    n = imgs.shape[0]

    r_u = size // 2 - 2
    rings = pack_rings(size, r_u)
    ft = fft2_centered(jnp.asarray(imgs))
    dat = extract_packed(ft, rings) * rings.mask

    if a.no_ctf:
        ctf = jnp.ones_like(jnp.real(dat))
    else:
        params = ctf_params(thu.voltage, thu.defocus_u, thu.defocus_v,
                            thu.defocus_theta, thu.cs,
                            thu.amplitude_contrast, thu.phase_shift)
        ctf = ctf_packed(params, rings.i_col, rings.i_row, size, a.pixelsize)

    quats = jnp.asarray(thu.quat, jnp.float32)
    trans = jnp.asarray(thu.trans, jnp.float32)
    rot = rotate3d(quats)

    tra = translate_phases(rings, trans[:, None, :])[:, 0]
    vals = dat * jnp.conj(tra) * ctf / n
    ctf2w = ctf * ctf * rings.mask / n

    big = size * pf
    f_grid = jnp.zeros((big,) * 3, jnp.complex64)
    t_grid = jnp.zeros((big,) * 3, jnp.float32)
    f_grid, t_grid = insert_slices_3d(
        f_grid, t_grid, vals[:, None, :], ctf2w[:, None, :], rot[:, None],
        rings.i_col, rings.i_row, pf, (r_u - 1) * pf,
    )
    f_grid = hermitianize(f_grid)
    t_grid = hermitianize_real(t_grid)

    sym = Symmetry(a.sym)
    if sym.order > 1:
        f_grid = symmetrize_ft(f_grid, sym.matrices, (r_u - 1) * pf)
        t_grid = jnp.real(
            symmetrize_ft(t_grid.astype(jnp.complex64), sym.matrices,
                          (r_u - 1) * pf)
        )

    fsc = jnp.ones(size // 2, jnp.float32)
    vol = reconstruct(f_grid, t_grid, fsc, size, pf, r_u, map_wiener=False)
    write_mrc(a.o, np.asarray(vol), a.pixelsize)


if __name__ == "__main__":
    main()
