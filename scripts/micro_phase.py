"""Micro-benchmark the particle-filter phase body's pieces on the
current backend: projector gather vs likelihood vs resampling."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, n=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from bench import _enable_compile_cache

    _enable_compile_cache()

    from thunder_tpu import particle as pt
    from thunder_tpu.geometry.quaternion import random_quat, rotate3d
    from thunder_tpu.ops.fourier import pack_rings
    from thunder_tpu.ops.likelihood import log_dvp_local
    from thunder_tpu.ops.projector import project_classed, ri_split
    from thunder_tpu.optimiser import _phase_step, _RingsView

    size, pf = 128, 2
    L, R, T = 512, 32, 16
    r = 14
    rings = pack_rings(size, r, 1)
    i_col = np.asarray(rings.i_col)
    i_row = np.asarray(rings.i_row)
    P = i_col.shape[0]
    print(f"L={L} R={R} T={T} P={P} (valid {rings.n_valid})")

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)
    big = size * pf
    cls = np.zeros((L,), np.int32)  # numpy: closure constants need no d2h

    @jax.jit
    def make_inputs(ks):
        crop = 2 * (pf * r + 2)  # what _proj_crop_size gives the phase loop
        proj_stack = (jax.random.normal(ks[0], (1, crop, crop, crop))
                      + 1j * jax.random.normal(ks[1], (1, crop, crop, crop))
                      ).astype(jnp.complex64)
        rot = rotate3d(random_quat(ks[2], (L, R)))
        dat_w = (jax.random.normal(ks[3], (L, P))
                 + 1j * jax.random.normal(ks[4], (L, P))).astype(jnp.complex64)
        sctf2 = -jnp.abs(jax.random.normal(ks[5], (L, P)))
        a_term = jax.random.normal(ks[6], (L,))
        tra = jnp.exp(1j * jax.random.uniform(ks[8], (L, T, P))).astype(jnp.complex64)
        return ri_split(proj_stack), rot, dat_w, sctf2, a_term, tra

    proj_stack, rot, dat_w, sctf2, a_term, tra = make_inputs(jnp.stack(list(ks[:9])))
    par = pt.init_particles(ks[7], L, R, T, 1, 3.0, pt.MODE_3D)

    gather = jax.jit(lambda ps, cl, rot: project_classed(
        ps, cl, rot, _RingsView(i_col, i_row, size), pf, False))
    cls_d = jnp.asarray(cls)
    t = timeit(gather, proj_stack, cls_d, rot)
    print(f"projector gather   : {t * 1e3:8.1f} ms", flush=True)

    pri = gather(proj_stack, cls_d, rot)
    lik = jax.jit(log_dvp_local)
    t = timeit(lik, dat_w, sctf2, pri, tra, a_term)
    print(f"likelihood matmul  : {t * 1e3:8.1f} ms")

    resample = jax.jit(lambda k, s: pt.resample_r(k, s._replace(u_r=jnp.abs(
        jax.random.normal(k, s.u_r.shape))), R))
    t = timeit(resample, ks[9], par)
    print(f"resample_r         : {t * 1e3:8.1f} ms")

    perturb = jax.jit(lambda k, s: pt.perturb_r(k, s, 0.5, pt.MODE_3D))
    t = timeit(perturb, ks[9], par)
    print(f"perturb_r (ACG)    : {t * 1e3:8.1f} ms")

    vari = jax.jit(lambda s: pt.cal_vari_r(s, pt.MODE_3D))
    t = timeit(vari, par)
    print(f"cal_vari_r (eigh)  : {t * 1e3:8.1f} ms")

    step = lambda k, ps: _phase_step(
        k, par, cls, ps, i_col, i_row, dat_w, sctf2,
        a_term, size, pf, pt.MODE_3D, 0.5, 3.0)
    t = timeit(step, ks[9], proj_stack)
    print(f"full _phase_step   : {t * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
