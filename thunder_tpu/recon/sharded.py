"""Volume-sharded gridding reconstruction (big-box path).

The reference keeps whole padded F/T/W/C volumes per rank and merely
crops the reconstructor grid (Model.cpp:1113); boxes ≳1000 px were a
known segfault (README.md:58-59).  The TPU build's "context
parallelism" axis (SURVEY §5) is volume sharding: the four padded
grids are stored as contiguous z-slabs across the mesh's ``data`` axis
(per hemisphere), and the balance loop's 3D FFT convolutions run as
distributed FFTs — local 2D FFTs + one ``all_to_all`` slab transpose +
a local 1D FFT — so no device ever materialises a full padded volume.

Layouts inside the shard_map (per device):
  freq/real z-slab : (1, K, big/d, big, big)   "z-sharded"
  transposed       : (1, K, big, big/d, big)   "y-sharded" (z local)

The math mirrors recon/reconstructor.py step for step
(Reconstructor.cpp:1129-1831); reductions over the volume become
``pmax`` over the data axis, and the centered<->FFT layout shift along
the sharded axis is a whole-slab ppermute (requires an even data-axis
size so the half-box roll moves whole slabs).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

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
from thunder_tpu.physics.kernels import mkb_rl, tik_rl
from thunder_tpu.recon.reconstructor import _mkb_rl_nf


def _local_z(big: int, d: int):
    """Global z indices of this device's slab (traced axis_index)."""
    bz = big // d
    j = jax.lax.axis_index("data")
    return j * bz + jnp.arange(bz, dtype=jnp.int32)


def _fft3_dist(x, d: int, inverse: bool):
    """Distributed 3D (i)FFT of a z-sharded local block (..., bz, big, big).

    Forward: local (y, x) FFT -> all_to_all slab transpose -> local z FFT;
    returns the SAME z-sharded layout via the inverse transpose.  Two
    all_to_alls per call; all compute local.
    """
    f2 = jnp.fft.ifftn if inverse else jnp.fft.fftn
    f1 = jnp.fft.ifft if inverse else jnp.fft.fft
    nd = x.ndim
    x = f2(x, axes=(nd - 2, nd - 1))
    if d > 1:
        # (..., bz, Y, X) -> (..., Z, Y/d, X): z becomes local
        x = jax.lax.all_to_all(x, "data", split_axis=nd - 2,
                               concat_axis=nd - 3, tiled=True)
    x = f1(x, axis=nd - 3)
    if d > 1:
        x = jax.lax.all_to_all(x, "data", split_axis=nd - 3,
                               concat_axis=nd - 2, tiled=True)
    return x


def _shift_z_sharded(x, d: int, axis: int):
    """Roll by big/2 along the SHARDED z axis: a whole-slab ppermute by
    d/2 hops (d even), plus nothing locally."""
    if d == 1:
        big = x.shape[axis]
        return jnp.roll(x, big // 2, axis=axis)
    assert d % 2 == 0, "volume sharding needs an even data-axis size"
    n = d
    perm = [(i, (i + n // 2) % n) for i in range(n)]
    return jax.lax.ppermute(x, "data", perm)


def _centered_to_fft(x, d: int):
    """Centered layout -> FFT layout (ifftshift) on a z-sharded block
    (..., bz, big, big)."""
    nd = x.ndim
    big = x.shape[nd - 1]
    x = jnp.roll(x, (big // 2, big // 2), axis=(nd - 2, nd - 1))
    return _shift_z_sharded(x, d, nd - 3)


def _fft_to_centered(x, d: int):
    nd = x.ndim
    big = x.shape[nd - 1]
    x = jnp.roll(x, (-(big // 2), -(big // 2)), axis=(nd - 2, nd - 1))
    return _shift_z_sharded(x, d, nd - 3)


def _local_grids(big: int, d: int):
    """Centered-coordinate grids for this device's slab: (kz, ky, kx)
    broadcastable over (bz, big, big)."""
    c = big // 2
    kz = (_local_z(big, d) - c).astype(jnp.float32)[:, None, None]
    k = (jnp.arange(big, dtype=jnp.float32) - c)
    return kz, k[None, :, None], k[None, None, :]


def _mkb_window_local(big: int, d: int, a: float, alpha: float):
    """Real-space MKB window slab in FFT layout (wrapped coords)."""
    bz = big // d
    j = jax.lax.axis_index("data")
    zg = j * bz + jnp.arange(bz, dtype=jnp.float32)[:, None, None]
    zw = jnp.minimum(zg, big - zg)
    k = jnp.arange(big, dtype=jnp.float32)
    kw = jnp.minimum(k, big - k)
    r = jnp.sqrt(zw * zw + kw[None, :, None] ** 2
                 + kw[None, None, :] ** 2) / big
    return (mkb_rl(r, a, alpha) / _mkb_rl_nf(a, alpha)).astype(jnp.float32)


def _reconstruct_sharded_body(f2, t2, fsc_all, big: int, d: int,
                              size: int, pf: int, max_radius: int,
                              map_wiener: bool, join_half: bool,
                              grid_corr: bool):
    """shard_map body: local blocks f2/t2 (1, K, bz, big, big) centered;
    returns the real-space padded volume slab (1, K, bz, big, big) in
    CENTERED layout (extraction happens outside)."""
    k_cls = f2.shape[1]
    kz, ky, kx = _local_grids(big, d)
    quad = kz * kz + ky * ky + kx * kx
    inside = quad < float(max_radius * pf) ** 2

    t = jnp.real(t2)
    if map_wiener:
        u = jnp.round(jnp.sqrt(quad)).astype(jnp.int32)
        n_fsc = fsc_all.shape[-1]
        shell = jnp.minimum(u // pf, n_fsc - 1)
        fsc = fsc_all[:, shell]                    # (K, bz, big, big)
        fsc = jnp.where((u // pf >= n_fsc)[None], 0.0, fsc)
        fsc = jnp.clip(fsc, FSC_BASE_L, FSC_BASE_H)
        if join_half:
            fsc = jnp.sqrt(2 * fsc / (1 + fsc))
        active = ((u >= WIENER_FACTOR_MIN_R * pf)
                  & (u < max_radius * pf))[None]
        t = jnp.where(active[None], t / fsc[None], t)

    if grid_corr:
        t_fl = jnp.maximum(t, T_MIN)
        window = _mkb_window_local(big, d, DEFAULT_MKB_A, DEFAULT_MKB_ALPHA)
        w0 = jnp.where(inside, 1.0, 0.0)
        w0 = jnp.broadcast_to(w0[None, None], t.shape).astype(jnp.float32)

        t_fft = _centered_to_fft(t_fl, d)
        ins_fft = _centered_to_fft(
            jnp.broadcast_to(inside[None, None], t.shape), d)
        w = _centered_to_fft(w0, d)

        def convolute(c_freq):
            c_rl = jnp.real(_fft3_dist(c_freq.astype(jnp.complex64), d,
                                       inverse=True))
            return _fft3_dist((c_rl * window[None, None]).astype(
                jnp.complex64), d, inverse=False)

        def body(state):
            w, diff_prev, n_no_dec, it, _ = state
            c_f = convolute(t_fft * w)
            c_abs = jnp.abs(c_f)
            w = jnp.where(ins_fft, w / jnp.maximum(c_abs, C_ABS_MIN), w)
            diff_loc = jnp.max(jnp.where(ins_fft, jnp.abs(c_abs - 1.0), 0.0))
            diff = jax.lax.pmax(diff_loc, "data")
            n_no_dec = jnp.where(diff > diff_prev * DIFF_C_DECREASE_THRES,
                                 n_no_dec + 1, 0)
            return w, diff, n_no_dec, it + 1, diff_prev

        def cond(state):
            _, diff, n_no_dec, it, _ = state
            not_conv = diff >= DIFF_C_THRES
            not_stalled = jnp.logical_or(it < MIN_N_ITER_BALANCE,
                                         n_no_dec < N_DIFF_C_NO_DECREASE)
            return jnp.logical_and(it < MAX_N_ITER_BALANCE,
                                   jnp.logical_and(not_conv, not_stalled))

        big_f = jnp.asarray(jnp.finfo(jnp.float32).max)
        # scalar carries become device-varying inside shard_map (the
        # stall counters follow each hemisphere's own diff)
        vary = lambda x: jax.lax.pcast(x, ("hemi",), to="varying")
        state = (w, vary(big_f), vary(jnp.zeros((), jnp.int32)),
                 vary(jnp.zeros((), jnp.int32)), vary(big_f))
        state = body(state)
        w_fft, _, _, _, _ = jax.lax.while_loop(cond, body, state)
        w = _fft_to_centered(jnp.real(w_fft), d)
    else:
        w = jnp.where(inside[None, None], 1.0 / jnp.maximum(t, T_MIN), 0.0)

    pad_dst = jnp.where(inside[None, None], f2 * w, 0.0)
    rl = jnp.real(_fft3_dist(_centered_to_fft(pad_dst, d), d, inverse=True))
    return _fft_to_centered(rl, d)


def reconstruct_all_sharded(mesh, f2, t2, fsc_all, grid_size: int, pf: int,
                            max_radius: int, map_wiener: bool,
                            join_half: bool, grid_corr: bool,
                            out_size: int):
    """Volume-sharded replacement for optimiser._reconstruct_all_h.

    f2/t2: (2, K, big, big, big) centered grids, expected (or placed)
    z-sharded P("hemi", None, "data"); fsc_all (K, shells) replicated.
    Returns (2, K, out_size^3) real-space refs (replicated).
    """
    from jax import shard_map

    big = f2.shape[-1]
    d = mesh.shape["data"]
    assert big % d == 0, (big, d)

    spec = P("hemi", None, "data", None, None)
    body = partial(
        _reconstruct_sharded_body, big=big, d=d, size=grid_size, pf=pf,
        max_radius=max_radius, map_wiener=map_wiener,
        join_half=join_half, grid_corr=grid_corr,
    )
    rl = shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec, P(None, None)),
        out_specs=spec,
    )(f2, t2, fsc_all)

    # extraction + kernel correction + resize on the small unpadded box
    # (GSPMD reshards; the full padded volume is never replicated)
    c = big // 2
    h = grid_size // 2
    vol = jax.lax.dynamic_slice(
        rl, (0, 0, c - h, c - h, c - h),
        (2, f2.shape[1], grid_size, grid_size, grid_size))
    vol = jnp.fft.ifftshift(vol, axes=(-3, -2, -1))
    if grid_corr:
        from thunder_tpu.ops.fourier import radial_grid_dev

        r = radial_grid_dev(grid_size, 3) / (pf * grid_size)
        vol = vol / tik_rl(r).astype(jnp.float32)
    if grid_size != out_size:
        from thunder_tpu.ops.fourier import resize_rl

        vol = jax.vmap(jax.vmap(lambda v: resize_rl(v, out_size)))(vol)
    return vol


def sharded_grid_specs(mesh):
    """NamedSharding for the (2, K, big, big, big) F/T grids."""
    from jax.sharding import NamedSharding

    return NamedSharding(mesh, P("hemi", None, "data", None, None))
