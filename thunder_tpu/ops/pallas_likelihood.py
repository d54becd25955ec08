"""Pallas TPU kernel for the fused global-search likelihood.

The XLA path (ops/likelihood.py) materializes X = dat_w * conj(tra) of
shape (L, N, P) in HBM before the MXU contraction — for the global pose
grid that intermediate dominates HBM traffic.  This kernel recomputes
the translation-modulated data tile in VMEM per (L-tile, M-tile, P-slab)
and feeds the MXU directly, so HBM sees each operand once.

Math (ops/likelihood.py, Optimiser.cpp:9187 semantics):
    dvp[l,m,n] = a[l] + B[l,m] + C[l,m,n]
    B[l,m]     = sum_p sctf2[l,p] |pri[m,p]|^2
    C[l,m,n]   = -2 sum_p (x_re[l,n,p] pri_re[m,p] + x_im[l,n,p] pri_im[m,p])
    x          = dat_w * conj(tra):  x_re = dr tr + di ti,  x_im = di tr - dr ti

Inputs are split real/imag float32 (complex support in Mosaic is
limited); N (translations) is a small static loop inside the kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel(dr_ref, di_ref, s_ref, pr_ref, pi_ref, tr_ref, ti_ref,
            out_ref, *, n_trans: int):
    """Grid: (i_l, i_m, i_p).  Blocks:
    dr/di/s: (TL, TP); pr/pi: (TM, TP); tr/ti: (N, TP); out: (TL, TM, N).
    """
    i_p = pl.program_id(2)

    @pl.when(i_p == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dr = dr_ref[:]
    di = di_ref[:]
    s = s_ref[:]
    pr = pr_ref[:]
    pi = pi_ref[:]

    # B term: sctf2 @ |pri|^2 (appears identically for every n)
    b = jax.lax.dot_general(
        s, pr * pr + pi * pi,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    for n in range(n_trans):
        tr = tr_ref[n, :][None, :]
        ti = ti_ref[n, :][None, :]
        x_re = dr * tr + di * ti
        x_im = di * tr - dr * ti
        c = jax.lax.dot_general(
            x_re, pr, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            x_im, pi, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[:, :, n] += b - 2.0 * c


@partial(jax.jit, static_argnames=("block_l", "block_m", "block_p",
                                   "interpret"))
def log_dvp_block_pallas(dat_w: jax.Array, sctf2: jax.Array,
                         pri: jax.Array, tra: jax.Array, a_term: jax.Array,
                         block_l: int = 128, block_m: int = 128,
                         block_p: int = 512,
                         interpret: bool = False) -> jax.Array:
    """Drop-in replacement for ops.likelihood.log_dvp_block.

    dat_w (L,P) c64 = s*ctf*dat; sctf2 (L,P) f32; pri (M,P) c64;
    tra (N,P) c64; a_term (L,).  Returns (L, M, N) float32.
    """
    l, p = dat_w.shape
    m = pri.shape[0]
    n = tra.shape[0]

    lp = _round_up(l, block_l)
    mp = _round_up(m, block_m)
    pp = _round_up(p, block_p)

    def pad2(x, rows, cols):
        return jnp.pad(x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])))

    dr = pad2(jnp.real(dat_w).astype(jnp.float32), lp, pp)
    di = pad2(jnp.imag(dat_w).astype(jnp.float32), lp, pp)
    s = pad2(sctf2.astype(jnp.float32), lp, pp)
    pr = pad2(jnp.real(pri).astype(jnp.float32), mp, pp)
    pi = pad2(jnp.imag(pri).astype(jnp.float32), mp, pp)
    tr = pad2(jnp.real(tra).astype(jnp.float32), n, pp)
    ti = pad2(jnp.imag(tra).astype(jnp.float32), n, pp)

    grid = (lp // block_l, mp // block_m, pp // block_p)
    out = pl.pallas_call(
        partial(_kernel, n_trans=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_l, block_p), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_l, block_p), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_l, block_p), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_m, block_p), lambda i, j, k: (j, k)),
            pl.BlockSpec((block_m, block_p), lambda i, j, k: (j, k)),
            pl.BlockSpec((n, block_p), lambda i, j, k: (0, k)),
            pl.BlockSpec((n, block_p), lambda i, j, k: (0, k)),
        ],
        out_specs=pl.BlockSpec((block_l, block_m, n),
                               lambda i, j, k: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((lp, mp, n), jnp.float32),
        interpret=interpret,
    )(dr, di, s, pr, pi, tr, ti)
    return out[:l, :m, :] + a_term[:, None, None]
