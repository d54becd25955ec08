"""Gridding reconstruction: Wiener filter, iterative weight balancing,
final inverse transform + kernel correction.

Reference: Reconstructor::reconstruct (Reconstructor.cpp:1129-1831).
All steps below are jittable functions over centered full-space grids;
the hemisphere allreduce of F/T lives in the sharded driver (a psum over
the data mesh axis replacing MPI_Allreduce_Large, Reconstructor.cpp:2350).

Pipeline per class (3D; the 2D path is identical with plane FFTs):
  1. Wiener-divide T by the clamped FSC (join-half sqrt(2f/(1+f)) when
     merging hemispheres)            [Reconstructor.cpp:1156-1279]
  2. floor T at 1e-25, init W = 1 inside max radius     [:1288-1330]
  3. balance loop (<= 30): C = T.W -> real-space multiply by the MKB
     window -> back; W /= max(|C|, 1e-6); stop at max||C|-1| < 1e-2 or
     2 non-decreasing rounds after 10                    [:1356-1551]
  4. padDst = F.W -> inverse FFT -> extract 1/pf -> divide by the
     trilinear kernel FT in real space                   [:1589-1831]
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from thunder_tpu.constants import (
    C_ABS_MIN,
    DIFF_C_DECREASE_THRES,
    DIFF_C_THRES,
    FSC_BASE_H,
    FSC_BASE_L,
    MAX_N_ITER_BALANCE,
    MIN_N_ITER_BALANCE,
    N_DIFF_C_NO_DECREASE,
    T_MIN,
    WIENER_FACTOR_MIN_R,
    DEFAULT_MKB_A,
    DEFAULT_MKB_ALPHA,
)
from thunder_tpu.ops.fourier import (
    centered_quad_dev,
    centered_shell_dev,
    extract_rl,
    irfftn_safe,
    radial_grid_dev,
)
from thunder_tpu.physics.kernels import mkb_rl, tik_rl


def _pad_shell_index(big: int, ndim: int) -> jax.Array:
    """Integer shell index on device (no huge embedded constants)."""
    return centered_shell_dev(big, ndim)


def _mkb_rl_nf(a: float, alpha: float) -> float:
    """MKB_RL(0) normalization as a python scalar."""
    from scipy.special import i0 as i0_np

    v = float(alpha)
    i32 = np.sqrt(2 / (np.pi * v)) * (np.cosh(v) - np.sinh(v) / v)
    return float((2 * np.pi) ** 1.5 * a**3 / i0_np(alpha) / v**1.5 * i32)


def _mkb_window(big: int, ndim: int, a: float, alpha: float) -> jax.Array:
    """Real-space MKB window over the padded FFT-layout grid, normalized
    to 1 at the origin (convoluteC, Reconstructor.cpp:2595-2674).
    Computed on device (iota-based; constants would be ~0.5 GB at big
    boxes and choke compilation)."""
    r = radial_grid_dev(big, ndim) / big
    return (mkb_rl(r, a, alpha) / _mkb_rl_nf(a, alpha)).astype(jnp.float32)


def _tik_correction(size: int, ndim: int, pf: int) -> jax.Array:
    """Real-space trilinear kernel FT over the unpadded FFT-layout grid
    (final correction, Reconstructor.cpp:1784-1818); device-computed."""
    r = radial_grid_dev(size, ndim) / (pf * size)
    return tik_rl(r).astype(jnp.float32)


def _mkb_correction(size: int, ndim: int, pf: int,
                    a: float = DEFAULT_MKB_A,
                    alpha: float = DEFAULT_MKB_ALPHA) -> jax.Array:
    """Real-space MKB envelope for the blob-kernel option, normalised
    to 1 at the origin (Reconstructor.cpp:1785-1793: divide by
    MKB_RL(r/(pf N), a*pf, alpha) and multiply by MKB_RL(0, ...))."""
    r = radial_grid_dev(size, ndim) / (pf * size)
    nf = _mkb_rl_nf(a * pf, alpha)
    return (mkb_rl(r, a * pf, alpha) / nf).astype(jnp.float32)


def wiener_filter_t(t_grid: jax.Array, fsc_curve: jax.Array, pf: int,
                    max_radius: int, join_half: bool) -> jax.Array:
    """T /= clamp(FSC) on shells in [WIENER_FACTOR_MIN_R*pf, maxRadius*pf)."""
    big, ndim = t_grid.shape[-1], t_grid.ndim
    u = _pad_shell_index(big, ndim)
    n_fsc = fsc_curve.shape[0]
    shell = jnp.minimum(u // pf, n_fsc - 1)
    fsc = jnp.where(u // pf >= n_fsc, 0.0, fsc_curve[shell])
    fsc = jnp.clip(fsc, FSC_BASE_L, FSC_BASE_H)
    if join_half:
        fsc = jnp.sqrt(2 * fsc / (1 + fsc))
    active = (u >= WIENER_FACTOR_MIN_R * pf) & (u < max_radius * pf)
    return jnp.where(active, t_grid / fsc, t_grid)


def balance_weights(t_grid: jax.Array, pf: int, max_radius: int,
                    a: float = DEFAULT_MKB_A,
                    alpha: float = DEFAULT_MKB_ALPHA) -> jax.Array:
    """Iterate W such that (T.W) convolved with the gridding window ~ 1.

    t_grid: real float32 centered grid (already Wiener-filtered).
    Returns W (float32) on the centered grid.

    The spectra here (T, W, C) are real-valued fields over the frequency
    grid, and T/W are even under k -> -k (Hermitian accumulation), so
    the whole loop runs in **rfft half-space**: C -> real space via
    irfftn, multiply the real MKB window, back via rfftn — half the FFT
    work and bandwidth of the complex round trip the reference's FFTW
    c2r/r2c pair also exploits (Reconstructor.cpp:2595-2674).
    """
    big, ndim = t_grid.shape[-1], t_grid.ndim
    c = big // 2
    window = _mkb_window(big, ndim, a, alpha)
    axes = tuple(range(ndim))
    shape = t_grid.shape

    def to_half(x):
        return jnp.fft.ifftshift(x, axes=axes)[..., :c + 1]

    quad_inside_h = to_half(_quad_inside(big, ndim, max_radius * pf))
    t_half = to_half(jnp.maximum(t_grid, T_MIN))
    w0 = jnp.where(quad_inside_h, 1.0, 0.0).astype(jnp.float32)

    def convolute_c(c_half):
        # irfftn_safe: the fused TPU 3D irfftn is numerically broken at
        # several cube sizes (see ops/fourier.py) — a garbage convolve
        # here silently destroys W and every map downstream
        c_rl = irfftn_safe(c_half.astype(jnp.complex64), shape, axes)
        return jnp.fft.rfftn(c_rl * window, axes=axes)

    def body(state):
        w, diff_prev, n_no_dec, it, _ = state
        c_f = convolute_c(t_half * w)
        c_abs = jnp.abs(c_f)
        w = jnp.where(quad_inside_h, w / jnp.maximum(c_abs, C_ABS_MIN), w)
        diff = jnp.max(jnp.where(quad_inside_h, jnp.abs(c_abs - 1.0), 0.0))
        n_no_dec = jnp.where(diff > diff_prev * DIFF_C_DECREASE_THRES,
                             n_no_dec + 1, 0)
        return w, diff, n_no_dec, it + 1, diff_prev

    def cond(state):
        _, diff, n_no_dec, it, _ = state
        not_converged = diff >= DIFF_C_THRES
        not_stalled = jnp.logical_or(it < MIN_N_ITER_BALANCE,
                                     n_no_dec < N_DIFF_C_NO_DECREASE)
        return jnp.logical_and(
            it < MAX_N_ITER_BALANCE,
            jnp.logical_and(not_converged, not_stalled),
        )

    big_f = jnp.asarray(jnp.finfo(jnp.float32).max)
    state = (w0, big_f, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32), big_f)
    state = body(state)  # always run at least one iteration
    w_half, _, _, _, _ = jax.lax.while_loop(cond, body, state)

    # expand the real, even W back to the full centered grid by mirror
    # (device-side iota indices; constant index cubes would be GBs at
    # big boxes)
    idx = jnp.arange(big, dtype=jnp.int32)
    mirror = (big - idx) % big
    take_mirror = idx > c
    gx_col = jnp.minimum(jnp.where(take_mirror, mirror, idx), c)
    if ndim == 3:
        gz = jnp.where(take_mirror[None, None, :], mirror[:, None, None],
                       idx[:, None, None])
        gy = jnp.where(take_mirror[None, None, :], mirror[None, :, None],
                       idx[None, :, None])
        w_full = w_half[gz, gy, gx_col[None, None, :]]
    else:
        gy = jnp.where(take_mirror[None, :], mirror[:, None], idx[:, None])
        w_full = w_half[gy, gx_col[None, :]]
    return jnp.fft.fftshift(w_full, axes=axes)


def _quad_inside(big: int, ndim: int, radius: float) -> jax.Array:
    """|k|^2 < radius^2 over the centered grid, on device."""
    return centered_quad_dev(big, ndim) < radius**2


def finalize_reconstruction(f_grid: jax.Array, w: jax.Array, size: int,
                            pf: int, max_radius: int,
                            grid_corr: bool = True,
                            kernel: str = "trilinear") -> jax.Array:
    """F.W -> real space -> extract 1/pf -> trilinear kernel correction.

    Returns the reconstructed real-space volume/image (FFT layout, size^ndim).
    """
    big, ndim = f_grid.shape[-1], f_grid.ndim
    quad_inside = _quad_inside(big, ndim, max_radius * pf)
    pad_dst = jnp.where(quad_inside, f_grid * w, 0.0)
    # F was Hermitian-folded and W is real-even, so the padded spectrum
    # is Hermitian: a c2r transform does half the work of the complex
    # path (the reference's FFTW bw is c2r for the same reason)
    axes = tuple(range(ndim))
    c = big // 2
    half = jnp.fft.ifftshift(pad_dst, axes=axes)[..., :c + 1]
    rl = irfftn_safe(half, pad_dst.shape, axes)
    out = extract_rl(rl, pf)
    if grid_corr:
        corr = (_mkb_correction(size, ndim, pf) if kernel == "mkb"
                else _tik_correction(size, ndim, pf))
        out = out / corr
    # padding in real space spreads the density over pf^ndim fewer...
    # normalization: ifft of the padded grid divides by (pf*size)^ndim
    # while the reference's FFTW bw divides by the same count — scale
    # matches; extraction keeps values as-is.
    return out


@partial(jax.jit, static_argnames=("size", "pf", "max_radius", "map_wiener",
                                   "join_half", "grid_corr", "kernel"))
def reconstruct(f_grid: jax.Array, t_grid: jax.Array, fsc_curve: jax.Array,
                size: int, pf: int, max_radius: int,
                map_wiener: bool = True, join_half: bool = False,
                grid_corr: bool = True,
                kernel: str = "trilinear") -> jax.Array:
    """Full per-class reconstruction from accumulated (F, T) grids.

    One jitted program: Wiener -> balance while_loop -> final transform
    (a single device dispatch per class instead of ~15 eager ops)."""
    t_real = jnp.real(t_grid) if jnp.iscomplexobj(t_grid) else t_grid
    if map_wiener:
        t_real = wiener_filter_t(t_real, fsc_curve, pf, max_radius, join_half)
    if grid_corr:
        w = balance_weights(t_real, pf, max_radius)
    else:
        # no grid correction: W = 1/T inside radius (Reconstructor.cpp:1553-...)
        big, ndim = t_real.shape[-1], t_real.ndim
        quad_inside = _quad_inside(big, ndim, max_radius * pf)
        w = jnp.where(quad_inside, 1.0 / jnp.maximum(t_real, T_MIN), 0.0)
    return finalize_reconstruction(f_grid, w, size, pf, max_radius,
                                   grid_corr, kernel)


def reconstruct_two_pass(f_grid: jax.Array, t_grid: jax.Array,
                         fsc_curve: jax.Array, size: int, pf: int,
                         max_radius: int, join_half: bool = True,
                         grid_corr: bool = True,
                         kernel: str = "trilinear"):
    """The reference's per-round DOUBLE reconstruction in one program
    (reconstructRef, Optimiser.cpp:7310-7755): the MAP-free FSC pass
    and the Wiener(MAP) pass from the same (F, T) grids — one device
    dispatch for the whole round's reconstructions.

    Both balance loops run COLD.  Warm-starting the MAP pass from the
    FSC pass's W scaled by T1/T2 looks attractive (the Ts differ only
    by the smooth per-shell Wiener factor) but is a trap: T2*(W1*T1/T2)
    = T1*W1 exactly, so the convergence check (max|C-1|) is already
    satisfied at entry and the loop exits with W2 = W1*T1/T2 — pure
    per-pixel damping instead of the independently re-balanced W the
    reference computes (Reconstructor.cpp:1288-1551).  Measured on the
    32px CLI workload: final-map corr 0.66 -> 0.02 and one to two FSC
    shells lost per round.

    Returns (rec_fsc, rec_map).

    The two balance loops run as ONE vmapped while_loop (round-5): the
    batching rule masks each lane's carry by its own stopping
    predicate, so per-lane results are the independent loops' results
    exactly, while the FFT pair per iteration batches over both lanes
    and the dispatch count drops from N1+N2 to max(N1, N2) — the
    balance loops were the bulk of the measured 2.8 s reco_fsc stage
    at 256px (BENCH_r04 roofline)."""
    t_real = jnp.real(t_grid) if jnp.iscomplexobj(t_grid) else t_grid
    t_w = wiener_filter_t(t_real, fsc_curve, pf, max_radius, join_half)
    big, ndim = t_real.shape[-1], t_real.ndim
    # batch the two passes only at BIG grids: the batched while_loop
    # runs max(N1, N2) iterations for BOTH lanes (lane carries are
    # masked, work is not), which pays off when the per-iteration FFT
    # pair is expensive enough that fuller batching wins (256px rU
    # grids: reco_fsc 2.80 -> 2.35 s) and loses at small ones (128px:
    # 0.31 -> 0.47 s measured) where the iteration-count waste
    # dominates.
    if grid_corr and big >= 256 and ndim == 3:
        t12 = jnp.stack([t_real, t_w])
        w12 = jax.vmap(
            lambda t: balance_weights(t, pf, max_radius))(t12)
        rec_fsc, rec_map = jax.vmap(
            lambda w: finalize_reconstruction(f_grid, w, size, pf,
                                              max_radius, grid_corr,
                                              kernel))(w12)
        return rec_fsc, rec_map

    def one_w(t):
        if grid_corr:
            return balance_weights(t, pf, max_radius)
        quad_inside = _quad_inside(big, ndim, max_radius * pf)
        return jnp.where(quad_inside, 1.0 / jnp.maximum(t, T_MIN), 0.0)

    rec_fsc = finalize_reconstruction(f_grid, one_w(t_real), size, pf,
                                      max_radius, grid_corr, kernel)
    rec_map = finalize_reconstruction(f_grid, one_w(t_w), size, pf,
                                      max_radius, grid_corr, kernel)
    return rec_fsc, rec_map


def symmetrize_ft(grid: jax.Array, sym_mats: jax.Array, max_radius_pad: float) -> jax.Array:
    """Sum rotated copies over the symmetry group (SYMMETRIZE_FT,
    include/Geometry/Transformation.h:170-195): out = sum_s grid(R_s f),
    trilinear resampling, identity included.
    """
    big = grid.shape[-1]
    c = big // 2
    k = jnp.arange(big, dtype=jnp.float32) - c
    kz, ky, kx = jnp.meshgrid(k, k, k, indexing="ij")
    inside = (kx * kx + ky * ky + kz * kz) < max_radius_pad**2

    from thunder_tpu.ops.projector import _gather_trilinear_3d

    def one(rot):
        x = rot[0, 0] * kx + rot[0, 1] * ky + rot[0, 2] * kz
        y = rot[1, 0] * kx + rot[1, 1] * ky + rot[1, 2] * kz
        z = rot[2, 0] * kx + rot[2, 1] * ky + rot[2, 2] * kz
        return jnp.where(inside, _gather_trilinear_3d(grid, x, y, z), 0.0)

    def body(carry, rot):
        return carry + one(rot), None

    init = jnp.where(inside, grid, grid)  # identity element contribution
    out, _ = jax.lax.scan(body, init, sym_mats[1:]) if sym_mats.shape[0] > 1 else (init, None)
    return out
