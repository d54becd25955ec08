"""Brick-mode slice projection: the TPU software texture cache for
CONCENTRATED rotation clouds.

Motivation (measured, scripts/micro_rowwidth.py): the TPU row-gather
costs ~10 ns per issued row almost regardless of row width (8-word rows
10.3 ns, 32-word 17 ns), so the local-search phase loop's cost is the
ISSUE COUNT L x R x P of its per-(image, rotation, pixel) stencil
gathers — the measured floor at the 256px north-star box.  But in local
and CTF search the R rotations of one image are perturbations of one
pose (Particle::perturb with high ACG concentration): for a pixel p,
ALL R sample points lie within a small ball around the mean sample
point.  Storing the table as overlapping SPAN^3-voxel bricks lets ONE
wide row-take per (image, pixel) fetch every value all R rotations
need — an issue-count reduction of R x (stencil sharing), the same idea
as the reference GPU path's texture-cache locality
(gpu/src/cuthunder.cu ManagedArrayTexture + Kernel.cu:625-826 texture
fetches) but with the cache line chosen to match the particle filter's
actual access pattern.

Layout: bricks anchored every STRIDE cells in (z, y, x), each row
holding the SPAN^3 packed bf16-ri words of its window (padded to a
power-of-two row width).  x is Hermitian half-space (kx >= -GUARD,
GUARD extra true-valued planes so folded anchors near the kx=0 plane
stay in range); the per-(image,pixel) fold follows getFTHalf semantics
(Volume.h:393-480).  Guaranteed spread allowance per (image, pixel):
(SPAN-1)/2 - STRIDE/2 cells around the mean sample point; the caller
enables brick mode per round only when the measured rotation spread
fits (Optimiser._brick_mode), and out-of-range outliers degrade to
clamped interpolation.

Memory: span 8 / stride 4 costs the same as the half-space corner-row
table (16 bytes per table voxel); span 5 / stride 2 costs 2x.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from thunder_tpu.ops.projector import _unpack_ri


def _row_width(span: int) -> int:
    n = span ** 3
    w = 1
    while w < n:
        w *= 2
    return w


def guard_planes(span: int, stride: int) -> int:
    """Guard planes below kx=0 (multiple of stride so the anchor grid
    aligns)."""
    return ((span + stride - 1) // stride) * stride


def spread_margin(span: int, stride: int) -> float:
    """Guaranteed one-sided deviation allowance (cells) around the mean
    sample point: window usable interval is span-1 cells (trilinear
    stencil needs base+1), anchor quantization wastes stride/2."""
    return (span - 1) / 2.0 - stride / 2.0


def table_bytes(span: int, stride: int, b: int, k_cls: int = 1) -> int:
    """Brick-table size (bytes) for a b^3 source cube: the host-side
    memory guard the round driver uses before committing to a stride-1
    rung (the fast rungs trade HBM for gather rows)."""
    g = guard_planes(span, stride)
    c = b // 2
    nz = ny = (b + stride - 1) // stride
    nx = (g + c + stride - 1) // stride
    return k_cls * nz * ny * nx * _row_width(span) * 4


def brick_pack_half(packed: jax.Array, span: int = 8,
                    stride: int = 4) -> jax.Array:
    """uint32 ri-word spectra (K, B, B, B) centered -> brick rows.

    Returns (K, nz, ny, nx, W) uint32 with W = next_pow2(span^3);
    brick (i, j, m) covers cells z in [i*stride - c, ...), y likewise,
    x (= kx) in [m*stride - g, m*stride - g + span).
    """
    k_cls, b = packed.shape[0], packed.shape[-1]
    c = b // 2
    g = guard_planes(span, stride)
    sub = packed[..., c - g:]                     # kx in [-g, c)
    nz = ny = (b + stride - 1) // stride
    nx = (g + c + stride - 1) // stride
    pad = jnp.pad(sub, ((0, 0), (0, span), (0, span), (0, span)))
    # two-stage window stacking.  A single flat stack of all span^3
    # strided slices OOMs at span >= 10: XLA materialises each tiny
    # slice copy with (2,128)-tile padding on near-unit minor dims
    # (measured 128x expansion per slice, 70 GB total at 128px local
    # shapes).  Stacking (dy, dx) first gives an s^2-wide minor axis
    # (lane-friendly), then only SPAN dz-slices of that tensor are
    # stacked — max(s^2, span) slices instead of s^3, with every
    # intermediate laid out at >= s^2 lanes.
    s2 = span * span
    rows2 = jnp.stack(
        [pad[:, :, dy::stride, dx::stride][:, :, :ny, :nx]
         for dy in range(span) for dx in range(span)],
        axis=-1)                                  # (K, Zf, ny, nx, s^2)
    rows = jnp.stack(
        [rows2[:, dz::stride][:, :nz] for dz in range(span)],
        axis=-1)                                  # (K, nz, ny, nx, s^2, s)
    # row order must be dz-major (dz, dy, dx): put the dz axis ahead of
    # the (dy, dx) pairs before flattening
    rows = jnp.moveaxis(rows, -1, -2).reshape(
        k_cls, nz, ny, nx, span ** 3)
    w = _row_width(span)
    if w > span ** 3:
        rows = jnp.pad(rows, ((0, 0),) * 4 + ((0, w - span ** 3),))
    return rows


def _axis_hat(off: jax.Array, span: int) -> jax.Array:
    """(..., ) in-window positions -> (..., span) linear-interp weights.

    Out-of-window samples get ZERO weight (not clamped): a clamped
    value would be the likelihood of a CLOSER pose, which rewards
    out-of-margin rotations and lets clouds diffuse outward (measured
    as a seed-dependent alignment failure).  Zero weight scores the
    out-of-range pixels as missing signal — a graceful, proportional
    penalty that pulls the filter back toward its cloud."""
    j = jnp.arange(span, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(off[..., None] - j))
    ok = (off >= 0.0) & (off <= span - 1.0)
    return w * ok[..., None].astype(jnp.float32)


def project_classed_brick(tab: jax.Array, cls: jax.Array, rot: jax.Array,
                          rings, pf: int, b: int, span: int = 8,
                          stride: int = 4, r_block: int = 0) -> jax.Array:
    """Brick-mode slice extraction (3D local phases).

    tab : (K, nz, ny, nx, W) uint32 (brick_pack_half), built from a
          centered cube of size ``b``;
    cls : (L,) class of each image; rot: (L, R, 3, 3);
    rings: packed pixel view (i_col/i_row).
    Returns (L, R, P) complex64 — identical values to the corner-row
    gather whenever every rotation stays within the spread margin.
    """
    k_cls, nz, ny, nx, w_row = tab.shape
    c = b // 2
    g = guard_planes(span, stride)
    s3 = span ** 3

    fx = (rings.i_col * pf).astype(jnp.float32)   # (P,)
    fy = (rings.i_row * pf).astype(jnp.float32)
    x = rot[..., 0, 0:1] * fx + rot[..., 0, 1:2] * fy    # (L, R, P)
    y = rot[..., 1, 0:1] * fx + rot[..., 1, 1:2] * fy
    z = rot[..., 2, 0:1] * fx + rot[..., 2, 1:2] * fy

    # mean sample point per (l, p) from the mean rotation matrix
    mrot = jnp.mean(rot, axis=1)                  # (L, 3, 3)
    mx = mrot[:, 0, 0:1] * fx + mrot[:, 0, 1:2] * fy     # (L, P)
    my = mrot[:, 1, 0:1] * fx + mrot[:, 1, 1:2] * fy
    mz = mrot[:, 2, 0:1] * fx + mrot[:, 2, 1:2] * fy

    # Hermitian fold per (l, p): bricks store kx >= -g only
    sgn = jnp.where(mx < 0, -1.0, 1.0).astype(jnp.float32)   # (L, P)
    mxf, myf, mzf = mx * sgn, my * sgn, mz * sgn

    # anchor indices (centre the window on the mean point)
    half = (span - 1) / 2.0

    def anchor(v, lo_planes, n):
        idx = jnp.round((v + lo_planes - half) / stride).astype(jnp.int32)
        return jnp.clip(idx, 0, n - 1)

    azi = anchor(mzf, c, nz)
    ayi = anchor(myf, c, ny)
    axi = anchor(mxf, g, nx)
    lin = ((cls[:, None] * nz + azi) * ny + ayi) * nx + axi  # (L, P)

    taps = jnp.take(tab.reshape(-1, w_row), lin, axis=0)     # (L, P, W)
    re, im = _unpack_ri(taps[..., :s3])
    br = jnp.stack([re, im * sgn[..., None]], axis=1)        # (L,2,P,s3)
    br = br.reshape(br.shape[0], 2, br.shape[2], span, span, span)

    # window origins in centered/kx coordinates
    oz = (azi * stride - c).astype(jnp.float32)              # (L, P)
    oy = (ayi * stride - c).astype(jnp.float32)
    ox = (axi * stride - g).astype(jnp.float32)

    n_rot = rot.shape[1]
    if r_block == 0:
        # wider bricks amortise the big (L,P,2,span^3) value tensor
        # over more rotations per block (span 9: 317 -> 203 ms/phase at
        # 256px r=42, scripts/micro_brick.py); small bricks are
        # indifferent (span 5: 59 ms either way)
        r_block = 32 if span >= 9 else 8
    rb = min(r_block, n_rot)
    n_blk = (n_rot + rb - 1) // rb
    if n_blk * rb != n_rot:
        padr = n_blk * rb - n_rot
        x = jnp.pad(x, ((0, 0), (0, padr), (0, 0)))
        y = jnp.pad(y, ((0, 0), (0, padr), (0, 0)))
        z = jnp.pad(z, ((0, 0), (0, padr), (0, 0)))

    # Interpolation as explicit broadcast multiply-reduce with the
    # (l, p) batch axes LEADING on every operand.  einsum forms lower
    # these per-(image, pixel) contractions to batched tiny dots
    # (M=10, N=rb, K=25) that the TPU executes at ~0.1% MXU utilisation
    # with full transposed copies of the intermediates — measured 194
    # (einsum) vs 59 ms (this form) per phase-gather at 256px r=42
    # (scripts/micro_brick.py); the reduce fuses on the VPU without
    # materialising the product tensors.
    br_lp = jnp.moveaxis(br, 1, 2)                           # (L,P,2,z,y,x)
    br_lp = br_lp.reshape(br.shape[0], br.shape[2], 2,
                          span * span, span)                 # (L,P,2,zy,x)

    def blk(carry, inp):
        xb, yb, zb = inp                                     # (rb, L, P)
        xb = jnp.moveaxis(xb, 0, 1)                          # (L, rb, P)
        yb = jnp.moveaxis(yb, 0, 1)
        zb = jnp.moveaxis(zb, 0, 1)
        wz = _axis_hat(zb * sgn[:, None] - oz[:, None], span)
        wy = _axis_hat(yb * sgn[:, None] - oy[:, None], span)
        wx = _axis_hat(xb * sgn[:, None] - ox[:, None], span)
        # (L, P, rb, zy): z/y weights fused into one 25-wide factor
        wzy = (wz[..., :, None] * wy[..., None, :]).reshape(
            wz.shape[0], rb, wz.shape[2], span * span)
        wzy = jnp.moveaxis(wzy, 1, 2)                        # (L,P,rb,zy)
        # t1 (L,P,2,rb,x); out (L,P,2,rb)
        t1 = jnp.sum(br_lp[:, :, :, None, :, :]
                     * wzy[:, :, None, :, :, None], axis=4)
        out = jnp.sum(t1 * jnp.moveaxis(wx, 1, 2)[:, :, None], axis=-1)
        return carry, out

    def r(v):
        return jnp.moveaxis(v.reshape(v.shape[0], n_blk, rb, v.shape[-1]),
                            1, 0)                            # (n_blk, rb, L, P)

    _, outs = jax.lax.scan(blk, 0.0, (jnp.moveaxis(r(x), 2, 1),
                                      jnp.moveaxis(r(y), 2, 1),
                                      jnp.moveaxis(r(z), 2, 1)))
    # outs: (n_blk, L, P, 2, rb) -> (L, 2, n_blk*rb, P)
    outs = jnp.transpose(outs, (1, 3, 0, 4, 2))
    outs = outs.reshape(outs.shape[0], 2, n_blk * rb, outs.shape[-1])
    outs = outs[:, :, :n_rot]
    return jax.lax.complex(outs[:, 0], outs[:, 1])
