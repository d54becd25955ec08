"""Weighted Fourier insertion (backprojection).

Reference: Reconstructor::insertP (Reconstructor.cpp:569-866) — for each
selected pose, spread w * ctf * dat (and w * ctf^2 into T) with trilinear
weights at the rotated padded coordinate rot @ (pf i, pf j, 0).

TPU design: accumulate into a **full centered complex grid** with one
deterministic scatter-add over precomputed linearized indices; Hermitian
symmetry is restored once at the end (F <- F + conj(flip F) on the
half-marked grid) instead of per-sample hemisphere folding.  XLA's
scatter-add is deterministic (no atomics), replacing the reference's
per-voxel omp atomics and the GPU backend's atomicAdd kernels
(gpu/src/Kernel.cu:2276-3203).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _trilinear_taps(x, y, z):
    """8 corner (iz, iy, ix, weight) taps for coordinates (..., )."""
    fx, fy, fz = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    wx, wy, wz = x - fx, y - fy, z - fz
    ix, iy, iz = fx.astype(jnp.int32), fy.astype(jnp.int32), fz.astype(jnp.int32)
    taps = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = (
                    (wz if dz else 1 - wz)
                    * (wy if dy else 1 - wy)
                    * (wx if dx else 1 - wx)
                )
                taps.append((iz + dz, iy + dy, ix + dx, w))
    return taps


def _bilinear_taps(x, y):
    fx, fy = jnp.floor(x), jnp.floor(y)
    wx, wy = x - fx, y - fy
    ix, iy = fx.astype(jnp.int32), fy.astype(jnp.int32)
    taps = []
    for dy in (0, 1):
        for dx in (0, 1):
            w = (wy if dy else 1 - wy) * (wx if dx else 1 - wx)
            taps.append((iy + dy, ix + dx, w))
    return taps


def _mkb_taps(x, y, z, a: float, alpha: float):
    """Taps within the MKB blob support |d| < a (a <= 2): the 4^3
    neighbourhood around the sample, weighted by the blob's Fourier-
    domain profile MKB_FT — the reference's insertion kernel
    (_kernelFT = MKB_FT_R2(., a, alpha), Reconstructor.cpp:65-75,
    :424-567; the real-space MKB_RL envelope divides the final map
    instead, :1785-1793)."""
    from thunder_tpu.physics.kernels import mkb_ft

    fx, fy, fz = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    ix, iy, iz = (fx.astype(jnp.int32), fy.astype(jnp.int32),
                  fz.astype(jnp.int32))
    taps = []
    for dz in (-1, 0, 1, 2):
        for dy in (-1, 0, 1, 2):
            for dx in (-1, 0, 1, 2):
                r2 = ((fx + dx - x) ** 2 + (fy + dy - y) ** 2
                      + (fz + dz - z) ** 2)
                r = jnp.sqrt(jnp.maximum(r2, 0.0))
                w = jnp.where(r2 < a * a, mkb_ft(r, a, alpha), 0.0)
                taps.append((iz + dz, iy + dy, ix + dx, w))
    return taps


def insert_slices_3d(f_grid: jax.Array, t_grid: jax.Array,
                     vals: jax.Array, ctf2w: jax.Array,
                     rot: jax.Array, i_col: jax.Array, i_row: jax.Array,
                     pf: int, max_radius_pad: float,
                     kernel: str = "trilinear", a: float = 1.9,
                     alpha: float = 15.0) -> tuple[jax.Array, jax.Array]:
    """Scatter one batch of slices into (F, T).

    f_grid: (big, big, big) complex64 centered; t_grid same, float32.
    vals  : (..., p) complex  = w * ctf * translated data
    ctf2w : (..., p) float    = w * ctf^2
    rot   : (..., 3, 3); i_col/i_row: (p,) packed frequencies.
    kernel: "trilinear" (default, Config.h:97) or "mkb" (the modified
    Kaiser-Bessel blob option, Reconstructor.cpp:424-567).

    Returns updated (f_grid, t_grid).  Out-of-radius taps get zero
    weight (the packing already restricts to max radius; the pad-grid
    radius check mirrors Reconstructor.cpp's QUAD < (maxRadius*pf)^2).
    """
    big = f_grid.shape[-1]
    c = big // 2
    fx = (i_col * pf).astype(jnp.float32)
    fy = (i_row * pf).astype(jnp.float32)
    x = rot[..., 0, 0:1] * fx + rot[..., 0, 1:2] * fy
    y = rot[..., 1, 0:1] * fx + rot[..., 1, 1:2] * fy
    z = rot[..., 2, 0:1] * fx + rot[..., 2, 1:2] * fy

    inside = (x * x + y * y + z * z) < max_radius_pad**2
    vals = jnp.where(inside, vals, 0.0)
    ctf2w = jnp.where(inside, ctf2w, 0.0)

    vr = jnp.real(vals).reshape(-1).astype(jnp.float32)
    vi = jnp.imag(vals).reshape(-1).astype(jnp.float32)
    wflat = ctf2w.reshape(-1).astype(jnp.float32)
    xf, yf, zf = x.reshape(-1), y.reshape(-1), z.reshape(-1)

    if kernel == "mkb":
        taps = _mkb_taps(xf, yf, zf, a, alpha)
    else:
        taps = _trilinear_taps(xf, yf, zf)

    # one fused scatter-add: all taps x {Re F, Im F, T} as (T*N, 3)
    # float rows into a (big^3, 3) packed accumulator (separate
    # scatters cost ~3x more on TPU; scatter pays per update row)
    lins, upds = [], []
    for iz, iy, ix, w in taps:
        xi = jnp.clip(ix + c, 0, big - 1)
        yi = jnp.clip(iy + c, 0, big - 1)
        zi = jnp.clip(iz + c, 0, big - 1)
        lins.append((zi * big + yi) * big + xi)
        w32 = w.astype(jnp.float32)
        upds.append(jnp.stack([vr * w32, vi * w32, wflat * w32], axis=-1))
    g = jnp.stack([jnp.real(f_grid).reshape(-1),
                   jnp.imag(f_grid).reshape(-1),
                   t_grid.reshape(-1)], axis=-1)
    g = g.at[jnp.concatenate(lins)].add(jnp.concatenate(upds))
    f_grid = jax.lax.complex(g[:, 0], g[:, 1]).reshape(big, big, big)
    return f_grid, g[:, 2].reshape(big, big, big)


def insert_slices_2d(f_grid: jax.Array, t_grid: jax.Array,
                     vals: jax.Array, ctf2w: jax.Array,
                     rot: jax.Array, i_col: jax.Array, i_row: jax.Array,
                     pf: int, max_radius_pad: float) -> tuple[jax.Array, jax.Array]:
    """2D insertion (class averages; Reconstructor.cpp 2D branches)."""
    big = f_grid.shape[-1]
    c = big // 2
    fx = (i_col * pf).astype(jnp.float32)
    fy = (i_row * pf).astype(jnp.float32)
    x = rot[..., 0, 0:1] * fx + rot[..., 0, 1:2] * fy
    y = rot[..., 1, 0:1] * fx + rot[..., 1, 1:2] * fy

    inside = (x * x + y * y) < max_radius_pad**2
    vals = jnp.where(inside, vals, 0.0)
    ctf2w = jnp.where(inside, ctf2w, 0.0)

    vr = jnp.real(vals).reshape(-1).astype(jnp.float32)
    vi = jnp.imag(vals).reshape(-1).astype(jnp.float32)
    wflat = ctf2w.reshape(-1).astype(jnp.float32)
    xf, yf = x.reshape(-1), y.reshape(-1)

    lins, upds = [], []
    for iy, ix, w in _bilinear_taps(xf, yf):
        xi = jnp.clip(ix + c, 0, big - 1)
        yi = jnp.clip(iy + c, 0, big - 1)
        lins.append(yi * big + xi)
        w32 = w.astype(jnp.float32)
        upds.append(jnp.stack([vr * w32, vi * w32, wflat * w32], axis=-1))
    g = jnp.stack([jnp.real(f_grid).reshape(-1),
                   jnp.imag(f_grid).reshape(-1),
                   t_grid.reshape(-1)], axis=-1)
    g = g.at[jnp.concatenate(lins)].add(jnp.concatenate(upds))
    f_grid = jax.lax.complex(g[:, 0], g[:, 1]).reshape(big, big)
    return f_grid, g[:, 2].reshape(big, big)


def _hat(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _sweep_coeffs(rot, pf: int) -> dict:
    """Per-image branch-free sweep coefficients (see insert_sweep_3d).

    Dense slices are (row, col) = (i_row, i_col); position =
    i_col * pf*R[:,0] + i_row * pf*R[:,1], so the slice's first spatial
    axis (h = row) pairs with R column 1."""
    e1 = rot[:, :, 1] * pf                     # (B, 3) components (x,y,z)
    e2 = rot[:, :, 0] * pf
    nrm = rot[:, :, 2]                         # unit plane normal

    case = jnp.argmax(jnp.abs(nrm), axis=1)    # 0:x 1:y 2:z height axis
    # canonical (a, m, l) component indices per case
    a_i = case
    m_i = jnp.where(case == 2, 1, 2)           # z->y else z
    l_i = jnp.where(case == 0, 1, 0)           # x->y else x

    def comp(v, idx):
        return jnp.take_along_axis(v, idx[:, None], axis=1)[:, 0]

    ea1, em1, el1 = comp(e1, a_i), comp(e1, m_i), comp(e1, l_i)
    ea2, em2, el2 = comp(e2, a_i), comp(e2, m_i), comp(e2, l_i)
    n_a, n_m, n_l = comp(nrm, a_i), comp(nrm, m_i), comp(nrm, l_i)

    # h/k swap so the first-contracted direction (k) has the strongest
    # in-plane footprint
    swap_hk = (jnp.maximum(jnp.abs(em1), jnp.abs(el1))
               > jnp.maximum(jnp.abs(em2), jnp.abs(el2)))
    em1, em2 = (jnp.where(swap_hk, em2, em1), jnp.where(swap_hk, em1, em2))
    el1, el2 = (jnp.where(swap_hk, el2, el1), jnp.where(swap_hk, el1, el2))

    # m/l swap so pass 2's pivot |em2| dominates (division safety)
    swap_ml = jnp.abs(el2) > jnp.abs(em2)
    em1, el1 = (jnp.where(swap_ml, el1, em1), jnp.where(swap_ml, em1, el1))
    em2, el2 = (jnp.where(swap_ml, el2, em2), jnp.where(swap_ml, em2, el2))
    n_m, n_l = (jnp.where(swap_ml, n_l, n_m), jnp.where(swap_ml, n_m, n_l))

    det2 = el1 * em2 - el2 * em1
    n_a_safe = jnp.where(jnp.abs(n_a) < 1e-12, 1e-12, n_a)
    return dict(
        swap_hk=swap_hk, swap_ml=swap_ml,
        em1=em1, em2=em2,
        p_h=det2 / em2,                        # l-centre coeff on h
        q_m=el2 / em2,                         # l-centre coeff on m
        alpha=-n_l / n_a_safe, beta=-n_m / n_a_safe,
        case_oh=(case[:, None] == jnp.arange(3)[None, :]).astype(
            jnp.float32),
    )


def _sweep_s1(valsc, ctfwc, wcc, co: dict, ch: int, chunk: int, nk: int,
              hh, gg):
    """Passes 3^T and 2^T for one chunk: slice values -> the canonical
    in-plane raster S1 (chunk, ch, BIG_m, BIG_l) plus the per-image
    height coefficients in canonical orientation."""
    uc = jnp.stack([jnp.real(valsc), jnp.imag(valsc), ctfwc], axis=1)
    uc = (wcc[:, :, None, None, None] * uc[:, None]).reshape(
        chunk, ch, nk, nk)
    uc = jnp.where(co["swap_hk"][:, None, None, None],
                   jnp.swapaxes(uc, -1, -2), uc)
    # pass 3^T: spread along m.  The hat fields w3/w2 are the in-plane
    # analogues of the height pass's wz — (b, h, k|m, grid) tensors that
    # dominate HBM traffic at big grids — so they stream as bf16 too
    # (f32 accumulation via preferred_element_type).
    ctr_m = (co["em1"][:, None, None] * hh[None, :, None]
             + co["em2"][:, None, None] * hh[None, None, :])
    w3 = _hat(gg[None, None, None, :] - ctr_m[..., None]
              ).astype(jnp.bfloat16)
    b_hm = jnp.einsum("bhkm,bchk->bchm", w3, uc.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    # pass 2^T: spread along l with sheared centres
    ctr_l = (co["p_h"][:, None, None] * hh[None, :, None]
             + co["q_m"][:, None, None] * gg[None, None, :])
    w2 = _hat(gg[None, None, None, :] - ctr_l[..., None]
              ).astype(jnp.bfloat16)
    s1 = jnp.einsum("bhml,bchm->bcml", w2, b_hm.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    # undo the m/l swap so (m, l) are canonical per case
    s1 = jnp.where(co["swap_ml"][:, None, None, None],
                   jnp.swapaxes(s1, -1, -2), s1)
    alc2 = jnp.where(co["swap_ml"], co["beta"], co["alpha"])
    bec2 = jnp.where(co["swap_ml"], co["alpha"], co["beta"])
    return s1, alc2, bec2, co["case_oh"]


def _band_windows(u_pad, o_idx, w_sz: int):
    """Per-(b, x, tile) windows of a padded contraction axis:
    u_pad (b, x, c, K + 2*w_sz), o_idx (b, x, j) padded start indices ->
    (b, x, j, c, w_sz).  Lowered as a vmapped dynamic_slice — a gather
    of c*w_sz-element rows (the elementwise take_along_axis formulation
    gathers scalars, which TPU does ~100x slower per byte)."""
    c = u_pad.shape[2]

    def one(u, o):
        return jax.lax.dynamic_slice(u, (0, o), (c, w_sz))

    return jax.vmap(jax.vmap(jax.vmap(one, (None, 0)), (0, 0)),
                    (0, 0))(u_pad, o_idx)


# In-plane band-matmul tiling: output tiles of _BAND_T cells along the
# spread axis; the contraction window sizes cover the worst-case
# stride of the sheared hat centers (|em2| >= 0.82 -> T/0.82 + 3;
# |p_h| = pf^2 |n_a| / |em2| >= 1.155 -> T/1.155 + 3).
_BAND_T = 32
_BAND_W_A = 48
_BAND_W_B = 32


def _sweep_s1_banded(valsc, ctfwc, wcc, co: dict, ch: int, chunk: int,
                     nk: int, hh, gg):
    """_sweep_s1 with BANDED in-plane passes: the dense hat fields w3
    (b, h, k, m) and w2 (b, h, m, l) cost 20 + 41 MB/slice of HBM at
    256px rU-band shapes — most of the measured reco_insert wall after
    the height pass is windowed.  Each output tile of _BAND_T cells
    only receives from a _BAND_W_* window of the contracted axis
    (the hat support is 2 cells and the sheared centers move >= 0.82
    cell per input step), so each pass becomes per-(b, row, tile)
    window gathers + small band matmuls with IDENTICAL hat weights.

    Returns (s1 (chunk, ch, m, l) canonical, alc2, bec2, case_oh) —
    bitwise semantics of _sweep_s1 up to f32/bf16 summation order."""
    big = gg.shape[0]
    r_h = nk // 2
    t_sz = _BAND_T
    n_j = -(-big // t_sz)
    m_pad = n_j * t_sz
    gg_pad = jnp.arange(m_pad, dtype=jnp.float32) - big // 2
    gt = gg_pad.reshape(n_j, t_sz)                       # tile m values

    uc = jnp.stack([jnp.real(valsc), jnp.imag(valsc), ctfwc], axis=1)
    uc = (wcc[:, :, None, None, None] * uc[:, None]).reshape(
        chunk, ch, nk, nk)
    uc = jnp.where(co["swap_hk"][:, None, None, None],
                   jnp.swapaxes(uc, -1, -2), uc)

    em1 = co["em1"][:, None, None]                       # (b,1,1)
    em2 = co["em2"][:, None, None]

    # ---- pass A: spread k -> m (contract k) --------------------------
    w_a = _BAND_W_A
    u2 = jnp.transpose(uc, (0, 2, 1, 3))                 # (b, h, c, k)
    u2 = jnp.pad(u2, ((0, 0), (0, 0), (0, 0), (w_a, w_a))
                 ).astype(jnp.bfloat16)
    # window start: min over the tile of (gm - em1*h)/em2, minus hat
    # support; elementwise min of the two endpoints handles sign(em2)
    e0 = (gt[None, None, :, 0] - em1 * hh[None, :, None]) / em2
    e1 = (gt[None, None, :, -1] - em1 * hh[None, :, None]) / em2
    lo = jnp.minimum(e0, e1) - 1.0                       # (b, h, j) hh units
    o_a = jnp.clip(jnp.floor(lo).astype(jnp.int32) + r_h + w_a,
                   0, nk + w_a)                          # padded k index
    win_u = _band_windows(u2, o_a, w_a)                  # (b,h,j,c,Wa)
    k_hh = (o_a[..., None] - w_a + jnp.arange(w_a) - r_h
            ).astype(jnp.float32)                        # (b,h,j,Wa)
    ctr = em1[..., None] * hh[None, :, None, None] + em2[..., None] * k_hh
    wgt = _hat(gt[None, None, :, None, :] - ctr[..., None]
               ).astype(jnp.bfloat16)                    # (b,h,j,Wa,T)
    b_hm = jnp.einsum("bhjcw,bhjwt->bhjct", win_u, wgt,
                      preferred_element_type=jnp.float32)
    b_hm = jnp.transpose(b_hm, (0, 3, 1, 2, 4)).reshape(
        chunk, ch, nk, m_pad)[..., :big]                 # (b, c, h, m)

    # ---- pass B: spread h -> l (contract h) --------------------------
    w_b = _BAND_W_B
    p_h = co["p_h"][:, None, None]
    q_m = co["q_m"][:, None, None]
    u3 = jnp.transpose(b_hm, (0, 3, 1, 2))               # (b, m, c, h)
    u3 = jnp.pad(u3, ((0, 0), (0, 0), (0, 0), (w_b, w_b))
                 ).astype(jnp.bfloat16)
    gm = gg[None, :, None]                               # (1, m, 1)
    e0 = (gt[None, None, :, 0] - q_m * gm) / p_h
    e1 = (gt[None, None, :, -1] - q_m * gm) / p_h
    lo = jnp.minimum(e0, e1) - 1.0                       # (b, m, j)
    o_b = jnp.clip(jnp.floor(lo).astype(jnp.int32) + r_h + w_b,
                   0, nk + w_b)
    win_b = _band_windows(u3, o_b, w_b)                  # (b,m,j,c,Wb)
    h_hh = (o_b[..., None] - w_b + jnp.arange(w_b) - r_h
            ).astype(jnp.float32)                        # (b,m,j,Wb)
    ctr_l = p_h[..., None] * h_hh + q_m[..., None] * gm[..., None]
    wgt_b = _hat(gt[None, None, :, None, :] - ctr_l[..., None]
                 ).astype(jnp.bfloat16)                  # (b,m,j,Wb,T)
    s1 = jnp.einsum("bmjcw,bmjwt->bmjct", win_b, wgt_b,
                    preferred_element_type=jnp.float32)
    s1 = jnp.transpose(s1, (0, 3, 1, 2, 4)).reshape(
        chunk, ch, big, m_pad)[..., :big]                # (b, c, m, l)

    s1 = jnp.where(co["swap_ml"][:, None, None, None],
                   jnp.swapaxes(s1, -1, -2), s1)
    alc2 = jnp.where(co["swap_ml"], co["beta"], co["alpha"])
    bec2 = jnp.where(co["swap_ml"], co["alpha"], co["beta"])
    return s1, alc2, bec2, co["case_oh"]


# Height-axis kernel width for the sweep inserter.  The in-plane passes
# keep hat width 1 (trilinear-like), but the height pass needs width 2:
# a width-1 kernel centred on the plane's per-column height leaves the
# accumulated density T striped on tilted planes (the plane crosses each
# column at a different height), and the gridding balance loop amplifies
# the under-filled voxels into reference ringing — measured as a
# systematic 3D-classification failure (classes latch onto orientation
# instead of species).  Width 2 matches the reference's effective
# inter-plane coupling (its MKB option uses support a=1.9,
# Optimiser.h:434) and restores scatter-path classification behaviour;
# T tracks the same kernel, so the C/W balance stays consistent.
_Z_KERNEL_WIDTH = 2.0


def sweep_chunk_budget(big: int, chunk: int = 128,
                       wz_bytes: float = 2e9) -> int:
    """Height-pass working-set cap: wz is (chunk, big^3) bf16 — at the
    rU-band grids (big >= 300) an unbounded chunk exhausts HBM, which
    this backend reports as all-NaN output grids (reads of
    never-written memory), NOT an allocation error.  Multiples of 8
    keep the contraction dimension lane-aligned."""
    cap = int(wz_bytes // (big ** 3 * 2))
    return max(8, min(chunk, (cap // 8) * 8))


def _sweep_height_pass(acc, valsc, ctfwc, wcc, co: dict, ch: int,
                       chunk: int, nk: int, hh, gg):
    """One chunk of the 3-pass sweep accumulated into ``acc``
    (the (big, big, 3*ch, big) canonical-axes accumulator)."""
    big = gg.shape[0]
    s1, alc2, bec2, case_c = _sweep_s1(valsc, ctfwc, wcc, co, ch,
                                       chunk, nk, hh, gg)
    # pass 1^T: spread along the height axis.  The height weights
    # wz are the dominant HBM traffic of the whole inserter
    # (chunk x big^3 floats per step), so: (a) the three
    # height-axis cases are merged into ONE contraction by folding
    # the case one-hot into s1 (wz is case-independent — the
    # canonical coefficients already select per image), and (b) wz
    # streams as bfloat16 (same fidelity class as the bf16
    # projection tables; the contraction accumulates f32).
    # BATCH-MAJOR layout (round-5 fix of the 10.5 s reco_insert
    # stage, BENCH_r04): both dot operands carry the (m, l) batch
    # dims LEADING and contiguous — the old "bcml,baml->mlca" form
    # had them minor, forcing XLA to transpose the ~GB-scale wz
    # field before every batched dot step.  The dot output lands
    # directly in the accumulator's (m, l, c, a) layout.
    zeta = (alc2[None, None, :] * gg[None, :, None]
            + bec2[None, None, :] * gg[:, None, None])   # (m, l, B)
    zw = _Z_KERNEL_WIDTH
    wz = (_hat((gg[None, None, None, :] - zeta[..., None]) / zw) / zw
          ).astype(jnp.bfloat16)                          # (m, l, B, a)
    s1t = jnp.transpose(s1, (2, 3, 1, 0))                 # (m, l, ch, B)
    s1c = (case_c.T[None, None, :, None, :] * s1t[:, :, None]).reshape(
        big, big, 3 * ch, chunk).astype(jnp.bfloat16)
    contrib = jnp.einsum("mlcb,mlba->mlca", s1c, wz,
                         preferred_element_type=jnp.float32)
    return acc + contrib


def _sweep_sort_key(co: dict, n_bins: int = 48):
    """Slice ordering for the WINDOWED height pass: (case, quantized
    alpha, beta).  Consecutive slices then share a height-axis case and
    near-identical shear coefficients, so each scan chunk's hat field
    fits a narrow window around the chunk's mean shear plane instead of
    the full grid axis (the dense wz field is 84 MB/slice at 256px
    rU-band grids — the measured reco_insert wall, BENCH_r04)."""
    alc2 = jnp.where(co["swap_ml"], co["beta"], co["alpha"])
    bec2 = jnp.where(co["swap_ml"], co["alpha"], co["beta"])
    case = jnp.argmax(co["case_oh"], axis=-1).astype(jnp.int32)
    abin = jnp.clip(((alc2 + 1.5) * (n_bins / 3.0)).astype(jnp.int32),
                    0, n_bins - 1)
    order = jnp.lexsort((bec2, abin, case))
    return order, alc2, bec2, case


def _height_windowed_update(acc, s1, alc2, bec2, case_idx, ch: int,
                            gg, win: int):
    """Height pass, WINDOWED: the chunk's slices share a height case
    and tight shear coefficients (guaranteed by the caller's cond), so
    the a-axis hat field only spans ``win`` cells around the chunk's
    midrange shear plane c0(m, l); the windowed contribution is then
    added into the case's accumulator slab through an a-axis gather
    (take_along_axis) — big^3-per-slice HBM traffic becomes
    win*big^2-per-slice.

    acc: (3, big, big, ch, big) per-case canonical accumulator.
    s1:  (chunk, ch, m, l) canonical in-plane rasters.
    """
    big = gg.shape[0]
    zw = _Z_KERNEL_WIDTH
    abar = 0.5 * (jnp.max(alc2) + jnp.min(alc2))
    bbar = 0.5 * (jnp.max(bec2) + jnp.min(bec2))
    c0 = jnp.round(abar * gg[None, :] + bbar * gg[:, None])    # (m, l)
    zeta = (alc2[None, None, :] * gg[None, :, None]
            + bec2[None, None, :] * gg[:, None, None])         # (m, l, b)
    ww = jnp.arange(win, dtype=jnp.float32) - win // 2
    # window slot w holds centered coordinate c0 + ww[w]
    aw = c0[..., None, None] + ww[None, None, None, :]
    wzw = (_hat((aw - zeta[..., :, None]) / zw) / zw
           ).astype(jnp.bfloat16)                              # (m,l,b,w)
    s1t = jnp.transpose(s1, (2, 3, 1, 0)).astype(jnp.bfloat16)  # (m,l,c,b)
    cwin = jnp.einsum("mlcb,mlbw->mlcw", s1t, wzw,
                      preferred_element_type=jnp.float32)
    # add the window into the case slab at its per-(m, l) a-offset.
    # Row-structured: each (m, l) lane dynamic-slices its (ch, win)
    # a-window out of its own slab, adds, and writes it back — a
    # gather/scatter of ch*win-element rows.  (A take_along_axis over
    # the full (m, l, ch, a) output gathers SCALARS — measured 10x
    # slower than the entire dense height pass.)
    slab = jax.lax.dynamic_slice(
        acc, (case_idx, 0, 0, 0, 0), (1, big, big, ch, big))[0]
    off = jnp.clip((c0 + big // 2 - win // 2).astype(jnp.int32),
                   0, big - win).reshape(-1)                   # (m*l,)
    # window clipped at the grid edge: re-window cwin so the hat slots
    # line up with the clipped offset (shift = clipped - unclipped;
    # nonzero only within win cells of the grid edge, where only
    # out-of-grid hat mass is discarded)
    shift = off - (c0.reshape(-1) + big // 2 - win // 2).astype(jnp.int32)
    cflat = cwin.reshape(-1, ch, win)

    def lane(slab_ml, cw, o, sh):
        w = jax.lax.dynamic_slice(
            jnp.pad(cw, ((0, 0), (win, win))), (0, win + sh), (ch, win))
        cur = jax.lax.dynamic_slice(slab_ml, (0, o), (ch, win))
        return jax.lax.dynamic_update_slice(slab_ml, cur + w, (0, o))

    slab = jax.vmap(lane)(slab.reshape(-1, ch, big), cflat, off, shift)
    return jax.lax.dynamic_update_slice(
        acc, slab.reshape(1, big, big, ch, big), (case_idx, 0, 0, 0, 0))


def _height_dense_update(acc, s1, alc2, bec2, case_c, ch: int, gg,
                         sub: int = 16):
    """Height pass, DENSE fallback for chunks whose shear coefficients
    spread past the window (mixed-orientation global-round chunks):
    the full (m, l, b, a) hat field, sub-chunked so the bf16 field
    stays ~1.3 GB, accumulated into the per-case acc layout."""
    big = gg.shape[0]
    zw = _Z_KERNEL_WIDTH
    chunk = s1.shape[0]
    n_sub = max(1, chunk // sub)
    sub = chunk // n_sub

    def body(i, acc):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i * sub, sub, 0)
        al, be, cc = sl(alc2), sl(bec2), sl(case_c)
        s1s = sl(s1)
        zeta = (al[None, None, :] * gg[None, :, None]
                + be[None, None, :] * gg[:, None, None])
        wz = (_hat((gg[None, None, None, :] - zeta[..., None]) / zw) / zw
              ).astype(jnp.bfloat16)                           # (m,l,b,a)
        s1t = jnp.transpose(s1s, (2, 3, 1, 0))                 # (m,l,c,b)
        s1c = (cc.T[None, None, :, None, :] * s1t[:, :, None]).reshape(
            big, big, 3 * ch, sub).astype(jnp.bfloat16)
        contrib = jnp.einsum("mlcb,mlba->mlca", s1c, wz,
                             preferred_element_type=jnp.float32)
        contrib = contrib.reshape(big, big, 3, ch, big)
        return acc + jnp.transpose(contrib, (2, 0, 1, 3, 4))

    return jax.lax.fori_loop(0, n_sub, body, acc)


def _sweep_height_pass_v2(acc, valsc, ctfwc, wcc, co: dict, ch: int,
                          chunk: int, nk: int, hh, gg, win: int = 64,
                          banded_s1: bool = True):
    """One SORTED chunk of the 3-pass sweep into the per-case
    accumulator (3, big, big, ch, big): windowed height pass when the
    chunk is case-uniform with window-tight shear coefficients (the
    caller sorted by _sweep_sort_key, so at local rounds nearly every
    chunk qualifies), dense fallback otherwise."""
    big = gg.shape[0]
    win = min(win, big)
    s1_fn = _sweep_s1_banded if banded_s1 else _sweep_s1
    s1, alc2, bec2, case_c = s1_fn(valsc, ctfwc, wcc, co, ch,
                                   chunk, nk, hh, gg)
    case = jnp.argmax(case_c, axis=-1).astype(jnp.int32)
    uniform = jnp.all(case == case[0])
    dev = (0.5 * (jnp.max(alc2) - jnp.min(alc2))
           + 0.5 * (jnp.max(bec2) - jnp.min(bec2))) * (big // 2)
    ok = jnp.logical_and(uniform, dev + _Z_KERNEL_WIDTH + 1.0 <= win // 2)
    return jax.lax.cond(
        ok,
        lambda a: _height_windowed_update(a, s1, alc2, bec2, case[0],
                                          ch, gg, win),
        lambda a: _height_dense_update(a, s1, alc2, bec2, case_c, ch, gg),
        acc)


def _sweep_finalize_case(acc, n_cls: int, big: int):
    """(3, m, l, ch, a) per-case canonical accumulator -> (f, t)."""
    ch = 3 * n_cls
    v = (jnp.transpose(acc[0], (2, 0, 1, 3))
         + jnp.transpose(acc[1], (2, 0, 3, 1))
         + jnp.transpose(acc[2], (2, 3, 0, 1)))
    v = v.reshape(n_cls, 3, big, big, big)
    return jax.lax.complex(v[:, 0], v[:, 1]), v[:, 2]


def _sweep_finalize(acc, n_cls: int, big: int):
    """(m, l, case*ch, a) canonical accumulator -> (f, t) grids."""
    ch = 3 * n_cls
    # canonical (a, m, l) -> physical (z, y, x):
    #   case x (a=x, m=z, l=y): V[ch, z, y, x] = acc[z, y, ch0, x]
    #   case y (a=y, m=z, l=x): V[ch, z, y, x] = acc[z, x, ch1, y]
    #   case z (a=z, m=y, l=x): V[ch, z, y, x] = acc[y, x, ch2, z]
    acc = acc.reshape(big, big, 3, ch, big)
    v = (jnp.transpose(acc[:, :, 0], (2, 0, 1, 3))
         + jnp.transpose(acc[:, :, 1], (2, 0, 3, 1))
         + jnp.transpose(acc[:, :, 2], (2, 3, 0, 1)))
    v = v.reshape(n_cls, 3, big, big, big)
    return jax.lax.complex(v[:, 0], v[:, 1]), v[:, 2]


def insert_sweep_3d(vals: jax.Array, ctf2w: jax.Array, rot: jax.Array,
                    w_cls: jax.Array, big: int, pf: int,
                    chunk: int = 128) -> tuple[jax.Array, jax.Array]:
    """Scatter-free 3D Fourier insertion: dense shear sweeps.

    TPU scatter-add runs ~0.1 Gelem/s regardless of row shape, so the
    trilinear scatter (Reconstructor.cpp:569-866's spreading loop,
    Kernel.cu:2276-3203's atomicAdd kernels) is replaced by the exact
    ADJOINT of a 3-pass height-field slice resampler, built only from
    dense broadcast/reduce sweeps (~12x faster at bench shapes):

      1. each slice row is spread along the volume axis "m" closest to
         the in-plane k-direction (a 1D hat sweep over the dense grid),
      2. then along "l" (second in-plane sweep, sheared centres),
      3. then along the height axis "a" (the volume axis most aligned
         with the plane normal; |n_a| >= 1/sqrt(3)) with centres on the
         plane z = alpha*l + beta*m.

    Per-rotation branch choices (height axis, h/k swap, m/l swap) are
    made branch-free: input transposes + coefficient where-selects +
    three case-masked accumulator grids merged by axis permutation at
    the end.  The effective gridding kernel is a sheared product of
    hats (support ~ trilinear's); T accumulates the identical kernel,
    so the C/W balance normalises it consistently.

    vals : (B, NK, NK) complex64 dense centered slices, pre-masked and
           pre-weighted (FULL plane: both Hermitian mates present, so
           no hermitianize afterwards; DC is expected pre-doubled to
           match the half-space+fold path).
    ctf2w: (B, NK, NK) float32; rot: (B, 3, 3); w_cls: (K, B).
    Returns f (K, big, big, big) complex64, t (K, big, big, big) f32.
    """
    n_b, nk = vals.shape[0], vals.shape[1]
    n_cls = w_cls.shape[0]
    ch = 3 * n_cls
    chunk = sweep_chunk_budget(big, chunk)
    pad = (-n_b) % chunk
    if pad:
        vals = jnp.pad(vals, ((0, pad), (0, 0), (0, 0)))
        ctf2w = jnp.pad(ctf2w, ((0, pad), (0, 0), (0, 0)))
        rot = jnp.pad(rot, ((0, pad), (0, 0), (0, 0)),
                      constant_values=0.0)
        eye = jnp.broadcast_to(jnp.eye(3), (pad, 3, 3))
        rot = rot.at[n_b:].set(eye)
        w_cls = jnp.pad(w_cls, ((0, 0), (0, pad)))
    nb_pad = vals.shape[0]

    coeffs = _sweep_coeffs(rot, pf)
    c = big // 2
    r_h = nk // 2
    hh = jnp.arange(nk, dtype=jnp.float32) - r_h
    gg = jnp.arange(big, dtype=jnp.float32) - c

    def chunk_step(acc, inp):
        valsc, ctfwc, wcc, co = inp
        return _sweep_height_pass(acc, valsc, ctfwc, wcc, co, ch,
                                  chunk, nk, hh, gg), 0.0

    acc0 = jnp.zeros((big, big, 3 * ch, big), jnp.float32)
    n_chunks = nb_pad // chunk

    def r(x):
        return x.reshape((n_chunks, chunk) + x.shape[1:])

    acc, _ = jax.lax.scan(
        chunk_step, acc0,
        (r(vals), r(ctf2w), r(w_cls.T),
         jax.tree.map(r, coeffs)),
    )
    return _sweep_finalize(acc, n_cls, big)


def flat_chunk_budget(big: int, win: int = 64,
                      field_bytes: float = 1.2e9) -> int:
    """Scan-chunk size for the windowed flat inserter.  The binding
    transient is currently the DENSE in-plane pass-2 hat field
    (chunk, nk, big, big) bf16 with nk ~ big/2 (the windowed height
    field is only (big^2, chunk, win)); chunk is capped so that field
    stays ~1.2 GB.  Banding the in-plane passes lifts this cap."""
    cap = int(field_bytes // ((big // 2) * big * big * 2))
    return max(8, min(128, (cap // 8) * 8))


def insert_sweep_flat3d(vals: jax.Array, ctf2w: jax.Array, rot: jax.Array,
                        w_cls: jax.Array, big: int, pf: int,
                        chunk: int | None = None,
                        win: int = 64,
                        banded_s1: bool = True) -> tuple[jax.Array, jax.Array]:
    """Sorted windowed-height shear-sweep insertion (insert_sweep_3d
    semantics, round-5 kernel): slices sort by (height case, shear
    coefficients) so each scan chunk's height hat field fits a
    ``win``-cell window around the chunk's midrange shear plane — the
    dense big^3-per-slice field was the measured 62% of 256px local
    rounds (BENCH_r04; Reconstructor.cpp:569-866 is the matched
    scatter).  Bitwise-equal hat weights; only the evaluation support
    (where the hat is zero anyway) shrinks."""
    n_b, nk = vals.shape[0], vals.shape[1]
    n_cls = w_cls.shape[0]
    ch = 3 * n_cls
    if chunk is None:
        chunk = flat_chunk_budget(big, win)
    pad = (-n_b) % chunk
    if pad:
        vals = jnp.pad(vals, ((0, pad), (0, 0), (0, 0)))
        ctf2w = jnp.pad(ctf2w, ((0, pad), (0, 0), (0, 0)))
        rot = jnp.pad(rot, ((0, pad), (0, 0), (0, 0)))
        rot = rot.at[n_b:].set(jnp.broadcast_to(jnp.eye(3), (pad, 3, 3)))
        w_cls = jnp.pad(w_cls, ((0, 0), (0, pad)))
    nb_pad = vals.shape[0]

    coeffs = _sweep_coeffs(rot, pf)
    order, _, _, _ = _sweep_sort_key(coeffs)
    vals = vals[order]
    ctf2w = ctf2w[order]
    w_cls = w_cls[:, order]
    coeffs = jax.tree.map(lambda a: a[order], coeffs)

    c = big // 2
    r_h = nk // 2
    hh = jnp.arange(nk, dtype=jnp.float32) - r_h
    gg = jnp.arange(big, dtype=jnp.float32) - c
    n_chunks = nb_pad // chunk

    def r(x):
        return x.reshape((n_chunks, chunk) + x.shape[1:])

    def chunk_step(acc, inp):
        valsc, ctfwc, wcc, co = inp
        return _sweep_height_pass_v2(acc, valsc, ctfwc, wcc, co, ch,
                                     chunk, nk, hh, gg, win,
                                     banded_s1), 0.0

    acc0 = jnp.zeros((3, big, big, ch, big), jnp.float32)
    acc, _ = jax.lax.scan(
        chunk_step, acc0,
        (r(vals), r(ctf2w), r(w_cls.T), jax.tree.map(r, coeffs)),
    )
    return _sweep_finalize_case(acc, n_cls, big)


def insert_sweep_2d(vals: jax.Array, ctf2w: jax.Array, rot: jax.Array,
                    w_cls: jax.Array, big: int, pf: int,
                    chunk: int = 256) -> tuple[jax.Array, jax.Array]:
    """Scatter-free 2D Fourier insertion: the adjoint of a 2-pass
    sheared resampler (the 2D analogue of insert_sweep_3d, without the
    height axis).  Replaces the bilinear scatter for class-average
    reconstruction (Reconstructor.cpp's 2D branches) — the scatter was
    the measured 2D-classification bottleneck at mReco=100.

    vals : (B, NK, NK) complex64 dense centered slices (full plane,
           DC pre-doubled); ctf2w (B, NK, NK) f32; rot (B, 2, 2);
           w_cls (K, B).
    Returns f (K, big, big) complex64, t (K, big, big) float32.
    """
    n_b, nk = vals.shape[0], vals.shape[1]
    n_cls = w_cls.shape[0]
    ch = 3 * n_cls
    pad = (-n_b) % chunk
    if pad:
        vals = jnp.pad(vals, ((0, pad), (0, 0), (0, 0)))
        ctf2w = jnp.pad(ctf2w, ((0, pad), (0, 0), (0, 0)))
        rot = jnp.pad(rot, ((0, pad), (0, 0), (0, 0)))
        rot = rot.at[n_b:].set(jnp.broadcast_to(jnp.eye(2), (pad, 2, 2)))
        w_cls = jnp.pad(w_cls, ((0, 0), (0, pad)))
    nb_pad = vals.shape[0]

    # (row, col) pairing as in 3D: h = row pairs with R column 1
    e1 = rot[:, :, 1] * pf                       # (B, 2) = (x, y) comps
    e2 = rot[:, :, 0] * pf
    # contract k into the y axis first; pivot on |e2_y|
    swap_hk = jnp.abs(e2[:, 1]) < jnp.abs(e1[:, 1])
    ey1 = jnp.where(swap_hk, e2[:, 1], e1[:, 1])
    ey2 = jnp.where(swap_hk, e1[:, 1], e2[:, 1])
    ex1 = jnp.where(swap_hk, e2[:, 0], e1[:, 0])
    ex2 = jnp.where(swap_hk, e1[:, 0], e2[:, 0])
    det2 = ex1 * ey2 - ex2 * ey1
    p_h = det2 / ey2
    q_y = ex2 / ey2

    c = big // 2
    r_h = nk // 2
    hh = jnp.arange(nk, dtype=jnp.float32) - r_h
    gg = jnp.arange(big, dtype=jnp.float32) - c

    def chunk_step(acc, inp):
        valsc, ctfwc, wcc, sw_hk, ey1c, ey2c, p_hc, q_yc = inp
        uc = jnp.stack([jnp.real(valsc), jnp.imag(valsc), ctfwc], axis=1)
        uc = (wcc[:, :, None, None, None] * uc[:, None]).reshape(
            chunk, ch, nk, nk)
        uc = jnp.where(sw_hk[:, None, None, None],
                       jnp.swapaxes(uc, -1, -2), uc)
        # pass 2^T: spread along y
        ctr_y = (ey1c[:, None, None] * hh[None, :, None]
                 + ey2c[:, None, None] * hh[None, None, :])
        w2 = _hat(gg[None, None, None, :] - ctr_y[..., None])
        b_hy = jnp.einsum("bhky,bchk->bchy", w2, uc)
        # pass 1^T: spread along x with sheared centres
        ctr_x = (p_hc[:, None, None] * hh[None, :, None]
                 + q_yc[:, None, None] * gg[None, None, :])
        w1 = _hat(gg[None, None, None, :] - ctr_x[..., None])
        contrib = jnp.einsum("bhyx,bchy->cyx", w1, b_hy)
        return acc + contrib, None

    acc0 = jnp.zeros((ch, big, big), jnp.float32)
    n_chunks = nb_pad // chunk

    def r(x):
        return x.reshape((n_chunks, chunk) + x.shape[1:])

    acc, _ = jax.lax.scan(
        chunk_step, acc0,
        (r(vals), r(ctf2w), r(w_cls.T), r(swap_hk), r(ey1), r(ey2),
         r(p_h), r(q_y)),
    )
    v = acc.reshape(n_cls, 3, big, big)
    return jax.lax.complex(v[:, 0], v[:, 1]), v[:, 2]


def hermitianize(f_grid: jax.Array) -> jax.Array:
    """F <- F + conj(F(-k)): completes the two-hemisphere insertion.

    Each packed pixel was inserted once (half-space packing); the
    physical spectrum needs its Hermitian mate too, and insertion is
    linear so the fold can happen once at the end.  For even grids the
    index -c has no mirror partner; roll keeps the map exact on the
    [-c, c) box by wrapping (those frequencies are outside max radius).
    """
    nd = f_grid.ndim
    axes = tuple(range(nd))
    flipped = jnp.flip(f_grid, axis=axes)
    # flip maps index c+k -> big-1-(c+k) = c + (big-1-2c-k); for even big
    # (big = 2c) this is c + (-1 - k): a half-step offset — roll by 1
    # realigns -k to its slot.
    flipped = jnp.roll(flipped, shift=(1,) * nd, axis=axes)
    return f_grid + jnp.conj(flipped)


def hermitianize_real(t_grid: jax.Array) -> jax.Array:
    nd = t_grid.ndim
    axes = tuple(range(nd))
    flipped = jnp.roll(jnp.flip(t_grid, axis=axes), shift=(1,) * nd, axis=axes)
    return t_grid + flipped
