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
        # Distributed upsample.  Left to GSPMD (or run whole per hemi
        # device) the out_size^3 iFFT is compile-hostile and repeats the
        # full FFT on every data-axis replica; instead each device
        # builds its own z-slab of the zero-padded WRAPPED spectrum
        # from the (small, cheap) grid_size^3 FFT and the existing
        # distributed iFFT runs at out_size — per-device work and
        # memory are out^3/d, the big-box criterion this module exists
        # for.  Coefficient-preserving, identical to
        # ops.fourier.resize_rl(preserve="coefficients").
        vol = shard_map(
            partial(_upsample_slab_body, g=grid_size, out=out_size, d=d),
            mesh=mesh, in_specs=P("hemi"),
            out_specs=P("hemi", None, "data"),
        )(vol)
        # downstream consumers (cross-hemisphere FSC, masking, the
        # projection-table build) run on whole references — one
        # all-gather of the final f32 volume restores the module
        # contract (replicated over data); the heavy complex
        # intermediates above never left their slabs
        from jax.sharding import NamedSharding

        vol = jax.device_put(vol, NamedSharding(mesh, P("hemi")))
    return vol


def _upsample_slab_body(v, g: int, out: int, d: int):
    """shard_map body: v (1, K, g, g, g) real (this hemisphere,
    replicated over the data axis) -> this device's z-slab
    (1, K, out/d, out, out) of the Fourier-upsampled volume.

    The centered zero-pad of resize_rl places small freqs
    [-g/2, g/2) into the out-box; in wrapped layout that is
    w < g/2 -> ws = w and w >= out - g/2 -> ws = w - out + g."""
    bz = out // d
    ft = jnp.fft.fftn(v, axes=(-3, -2, -1))

    def axis_map(w):
        idx = jnp.where(w < g // 2, w, w - out + g)
        valid = (w < g // 2) | (w >= out - g // 2)
        return jnp.clip(idx, 0, g - 1), valid

    j = jax.lax.axis_index("data")
    iz, vz = axis_map(j * bz + jnp.arange(bz))
    iy, vy = axis_map(jnp.arange(out))
    sel = ft[:, :, iz][:, :, :, iy][:, :, :, :, iy]
    mask = (vz[:, None, None] & vy[None, :, None] & vy[None, None, :])
    x = jnp.where(mask, sel, 0j)
    return jnp.real(_fft3_dist(x, d, inverse=True))


def insert_sweep_3d_sharded(mesh, vals, ctf2w, rot, w_cls, big: int,
                            pf: int, chunk: int = 64):
    """Volume-sharded shear-sweep insertion: F/T accumulate directly as
    z-slabs over the mesh's data axis — no device ever materialises a
    full padded grid (the missing half of the big-box story next to
    reconstruct_all_sharded).

    Images are data-sharded; each device runs the in-plane passes for
    its local images, all_gathers the small per-chunk S1 rasters, and
    sweeps only its own slab of each case accumulator (the canonical
    axis that maps to physical z: 'a' for the z-case, 'm' for the x/y
    cases — so all three transpose into one z-sharded volume without a
    reshard).

    vals : (2, B, NK, NK) complex64 sharded P("hemi", "data");
    ctf2w: (2, B, NK, NK) f32; rot (2, B, 3, 3); w_cls (2, K, B).
    Returns f (2, K, big, big, big) c64 and t (...) f32, z-sharded
    P("hemi", None, "data").  Symmetrisation is the caller's job
    (pose-side: insert at R_s^-1-rotated poses).
    """
    from jax import shard_map

    from thunder_tpu.ops.insert import (
        _Z_KERNEL_WIDTH,
        _hat,
        _sweep_coeffs,
        _sweep_s1,
    )

    d = mesh.shape["data"]
    n_b = vals.shape[1]
    n_cls = w_cls.shape[1]
    ch = 3 * n_cls
    nk = vals.shape[-1]
    assert big % d == 0
    bz = big // d

    # pad B so every device scans the same chunk count
    pad = (-n_b) % (d * chunk)
    if pad:
        vals = jnp.pad(vals, ((0, 0), (0, pad), (0, 0), (0, 0)))
        ctf2w = jnp.pad(ctf2w, ((0, 0), (0, pad), (0, 0), (0, 0)))
        rot = jnp.pad(rot, ((0, 0), (0, pad), (0, 0), (0, 0)))
        rot = rot.at[:, n_b:].set(jnp.eye(3))
        w_cls = jnp.pad(w_cls, ((0, 0), (0, 0), (0, pad)))

    c = big // 2
    hh = jnp.arange(nk, dtype=jnp.float32) - nk // 2
    gg = jnp.arange(big, dtype=jnp.float32) - c

    def body(vals_l, ctf2w_l, rot_l, w_cls_l):
        # local blocks: (1, B/d, nk, nk) etc.
        v = vals_l[0]
        cw = ctf2w_l[0]
        ro = rot_l[0]
        wc = w_cls_l[0]
        n_loc = v.shape[0]
        n_chunks = max(1, n_loc // chunk)
        coeffs = _sweep_coeffs(ro, pf)

        j = jax.lax.axis_index("data")
        gg_a = (j * bz + jnp.arange(bz, dtype=jnp.float32)) - c

        def r(x):
            return x.reshape((n_chunks, n_loc // n_chunks) + x.shape[1:])

        def chunk_step(acc, inp):
            v_c, cw_c, wc_c, co = inp
            s1, alc2, bec2, case_c = _sweep_s1(
                v_c, cw_c, wc_c, co, ch, v_c.shape[0], nk, hh, gg)
            # gather the small rasters + height coefficients from the
            # whole data group: every device sweeps ALL images into its
            # own slab
            s1 = jax.lax.all_gather(s1, "data", axis=0, tiled=True)
            alc2 = jax.lax.all_gather(alc2, "data", axis=0, tiled=True)
            bec2 = jax.lax.all_gather(bec2, "data", axis=0, tiled=True)
            case_c = jax.lax.all_gather(case_c, "data", axis=0, tiled=True)

            zw = _Z_KERNEL_WIDTH
            # height weights stream as bf16 and both dot operands carry
            # the (m, l) batch dims LEADING (batch-major, the round-5
            # reco_insert fix in ops/insert.py:_sweep_height_pass — the
            # old minor-batch form forced operand transposes of the
            # GB-scale hat field); the case one-hots fold into s1,
            # split here by which canonical axis is the sharded slab
            # case z: the height axis IS the sharded axis
            zeta = (alc2[None, None, :] * gg[None, :, None]
                    + bec2[None, None, :] * gg[:, None, None])  # (m,l,b)
            wz = (_hat((gg_a[None, None, None, :] - zeta[..., None]) / zw)
                  / zw).astype(jnp.bfloat16)                    # (m,l,b,bz)
            s1z = ((case_c[:, 2, None, None, None] * s1)
                   .transpose(2, 3, 1, 0)).astype(jnp.bfloat16)  # (m,l,c,b)
            acc_z = acc[0] + jnp.einsum(
                "mlcb,mlba->mlca", s1z, wz,
                preferred_element_type=jnp.float32)
            # cases y and x: the canonical m axis is the sharded one;
            # both share wz_m, so they merge into one contraction
            m_lo = j * bz
            s1_m = jax.lax.dynamic_slice_in_dim(s1, m_lo, bz, axis=2)
            zeta_m = (alc2[None, None, :] * gg[None, :, None]
                      + bec2[None, None, :] * gg_a[:, None, None])
            wz_m = (_hat((gg[None, None, None, :]
                          - zeta_m[..., None]) / zw) / zw).astype(jnp.bfloat16)
            s1_yx = jnp.concatenate(
                [case_c[:, 1, None, None, None] * s1_m,
                 case_c[:, 0, None, None, None] * s1_m], axis=1,
            ).transpose(2, 3, 1, 0).astype(jnp.bfloat16)        # (m,l,2c,b)
            acc_yx = acc[1] + jnp.einsum(
                "mlcb,mlba->mlca", s1_yx, wz_m,
                preferred_element_type=jnp.float32)
            return (acc_z, acc_yx), 0.0

        vary = lambda x: jax.lax.pcast(x, ("hemi", "data"), to="varying")
        acc0 = (vary(jnp.zeros((big, big, ch, bz), jnp.float32)),
                vary(jnp.zeros((bz, big, 2 * ch, big), jnp.float32)))
        acc, _ = jax.lax.scan(
            chunk_step, acc0,
            (r(v), r(cw), r(wc.T), jax.tree.map(r, coeffs)))

        # canonical (m, l, c, a) -> physical (z-slab, y, x); the same
        # per-case permutations as the unsharded inserter, with the
        # slab in the same axis positions
        acc_z, acc_yx = acc
        acc_yx = acc_yx.reshape(bz, big, 2, ch, big)
        vv = (jnp.transpose(acc_z, (2, 3, 0, 1))
              + jnp.transpose(acc_yx[:, :, 0], (2, 0, 3, 1))
              + jnp.transpose(acc_yx[:, :, 1], (2, 0, 1, 3)))
        vv = vv.reshape(n_cls, 3, bz, big, big)
        f = jax.lax.complex(vv[:, 0], vv[:, 1])
        return f[None], vv[None, :, 2]

    spec_img = P("hemi", "data", None, None)
    spec_rot = P("hemi", "data", None, None)
    spec_w = P("hemi", None, "data")
    spec_out = P("hemi", None, "data", None, None)
    return shard_map(
        body, mesh=mesh,
        in_specs=(spec_img, spec_img, spec_rot, spec_w),
        out_specs=(spec_out, spec_out),
    )(vals, ctf2w, rot, w_cls)


def sharded_grid_specs(mesh):
    """NamedSharding for the (2, K, big, big, big) F/T grids."""
    from jax.sharding import NamedSharding

    return NamedSharding(mesh, P("hemi", None, "data", None, None))
