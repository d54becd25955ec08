"""thunder_project rebuild: generate projections of a volume at given or
random poses (appsrc/thunder_project.cpp).

    python -m thunder_tpu.cli.project -i map.mrc -o projs.mrcs -n 100
    python -m thunder_tpu.cli.project -i map.mrc -o projs.mrcs --thu meta.thu
"""

from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser(prog="thunder_project")
    p.add_argument("-i", required=True, help="input volume MRC")
    p.add_argument("-o", required=True, help="output stack .mrcs")
    p.add_argument("-n", type=int, default=100, help="number of random poses")
    p.add_argument("--thu", help=".thu with poses to use instead of random")
    p.add_argument("--pf", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save-thu", help="write the drawn poses to a .thu")
    a = p.parse_args(argv)

    from thunder_tpu.geometry.quaternion import random_quat, rotate3d
    from thunder_tpu.io.mrc import read_mrc, write_mrc
    from thunder_tpu.io.thu import ThuTable, read_thu, write_thu
    from thunder_tpu.ops.fourier import ifft2_centered, translate_ft
    from thunder_tpu.ops.projector import prepare_projectee_3d, project_full_3d

    vol, ps = read_mrc(a.i)
    proj = prepare_projectee_3d(jnp.asarray(vol), a.pf)

    if a.thu:
        t = read_thu(a.thu)
        quats = jnp.asarray(t.quat, jnp.float32)
        trans = jnp.asarray(t.trans, jnp.float32)
        n = len(t)
    else:
        key = jax.random.PRNGKey(a.seed)
        quats = random_quat(key, (a.n,))
        trans = jnp.zeros((a.n, 2))
        n = a.n

    rots = rotate3d(quats)
    imgs = []
    for i in range(n):
        ft = project_full_3d(proj, rots[i])
        ft = translate_ft(ft, trans[i, 0], trans[i, 1])
        imgs.append(np.asarray(ifft2_centered(ft)))
    write_mrc(a.o, np.stack(imgs), ps, is_stack=True)

    if a.save_thu:
        t = ThuTable.blank(n)
        t.quat = np.asarray(quats, np.float64)
        t.trans = np.asarray(trans, np.float64)
        t.particle_path = [f"{i + 1}@{a.o}" for i in range(n)]
        write_thu(a.save_thu, t)


if __name__ == "__main__":
    main()
