"""The E-M driver: expectation (pose search) + maximization (sigma +
reconstruction) + round-level control.

Re-design of Optimiser (src/Optimiser.cpp, 10k LoC) as a host-orchestrated
loop over jitted device stages:

  round:
    pack pixel rings for the current cutoff r          [allocPreCalIdx]
    GLOBAL: scanned MXU pose grid -> class/rot/trans marginals
                                                       [expectation :633-1136]
    particle-filter phases: perturb -> evaluate -> resample
                                                       [expectation :1138-1681]
    sigma refresh from rank-1 residuals                [allReduceSigma :6397]
    reconstruction: draw poses -> scatter insertion -> gridding
                                                       [reconstructRef :6711]
    host: FSC between hemispheres, resolution & search-type state
    machine, checkpoints                               [Model, run :3561]

Hemisphere A/B = two independent replicas of the model state over
disjoint halves of the data (gold standard, Parallel.cpp:17-67); on a
device mesh the data axis shards each hemisphere's images and the F/T
accumulators psum over it (see thunder_tpu.parallel).

All hot stages are module-level jitted functions (compiled once per
ring-size bucket, reused across rounds and hemispheres).
"""

from __future__ import annotations

import math
import os
import time
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from thunder_tpu import particle as pt
from thunder_tpu.config import ThunderConfig
from thunder_tpu.constants import (
    MAX_N_PHASE_PER_ITER,
    MIN_N_PHASE_PER_ITER_GLOBAL,
    MIN_N_PHASE_PER_ITER_LOCAL,
    MIN_N_TRANSLATION_GLOBAL,
    N_PHASE_WITH_NO_VARI_DECREASE,
)
from thunder_tpu.geometry import Symmetry
from thunder_tpu.geometry.quaternion import random_quat, rotate2d_from_unit, rotate3d
from thunder_tpu.model import (
    ModelState,
    SEARCH_TYPE_CTF,
    SEARCH_TYPE_GLOBAL,
    SEARCH_TYPE_LOCAL,
    SEARCH_TYPE_STOP,
)
from thunder_tpu.ops.fourier import (
    PackedRings,
    extract_packed,
    pack_rings,
    resize_rl,
    translate_phases,
)
from thunder_tpu.ops.insert import (
    hermitianize,
    hermitianize_real,
    insert_slices_2d,
    insert_slices_3d,
)
from thunder_tpu.ops.likelihood import log_dvp_block, log_dvp_local
from thunder_tpu.ops.projector import (
    Projectee,
    prepare_projectee_2d,
    prepare_projectee_3d,
    project_2d,
    project_3d,
    project_classed,
    project_ri,
)
from thunder_tpu.physics.ctf import CtfParams, ctf_packed, ctf_packed_scaled
# (spectrum shell helpers are host-side only; device paths use ops.fourier iota grids)
from thunder_tpu.pipeline.preprocess import (
    init_sigma,
    preprocess_images,
    sigma_to_sig_rcp,
)
from thunder_tpu.recon.reconstructor import reconstruct, symmetrize_ft

PARTICLE_FILTER_DECREASE_FACTOR = 0.95  # include/Optimiser.h:60

_ROT_BLOCK = 256  # rotations per MXU block in global search

# -- compile-time accounting (VERDICT r3 #8) ---------------------------
# Every jit trace/lower/backend-compile second this process spends is
# accumulated here via jax.monitoring; run_round records the per-round
# delta as ``compile_s`` so a full refinement's compile overhead is
# visible next to its steady-state throughput (a fresh 256px phase
# program costs ~14 s through the remote backend; a real 20-45-round
# refinement pays one per rung x radius step).
_COMPILE_SECONDS = [0.0]


def _on_compile_event(event: str, duration: float, **kw) -> None:
    if event.startswith("/jax/core/compile/"):
        _COMPILE_SECONDS[0] += duration


def compile_seconds() -> float:
    """Cumulative jit trace+lower+compile seconds in this process."""
    return _COMPILE_SECONDS[0]


try:
    jax.monitoring.register_event_duration_secs_listener(_on_compile_event)
except Exception:            # monitoring API absent: report zeros
    pass

# Ceiling on a round's brick projection table (all classes).  The
# fastest rungs anchor a brick at every cell (stride 1), costing up to
# 256 B per table voxel — worth it for the gather-row cut, but only
# while the table (plus its same-sized build intermediates) stays a
# modest slice of the 16 GB v5e HBM next to ft_masked and the grids.
BRICK_TABLE_BUDGET = 2 << 30

# Insertion-slice budget per image: draw_poses_compact merges the
# m_reco draws' value-identical poses into at most this many weighted
# slices (exact below it; top-count truncation + renormalise above —
# measured q98 distinct = 38-83 at 256px local rounds, median 3-27).
RECO_COMPACT_SLOTS = 48


def _slice_l(params, sl: slice):
    """Slice every field of a (2, L)-leading pytree along L."""
    return jax.tree.map(lambda a: a[:, sl], params)


def json_dumps_bytes(obj) -> bytes:
    """Python json round-trips Infinity natively, which the model state
    uses as the variance-reset sentinel."""
    import json

    def default(o):
        if isinstance(o, (np.floating, np.integer)):
            return o.item()
        raise TypeError(type(o))

    return json.dumps(obj, default=default).encode()


# ======================================================================
# jitted device stages (module-level: compiled once per shape bucket)
# ======================================================================


def _proj_crop_size(size: int, pf: int, r_u: int) -> int:
    """Static crop size for the projectee spectrum: slice coordinates at
    search radius r_u reach at most pf*r_u from the origin, so only the
    central 2*(pf*r_u + 2) of the pf-padded cube is ever gathered.
    Shrinking the gather source keeps its working set cache-resident
    (the TPU gather's dominant cost; measured in scripts/micro_gather.py)
    — the spectral analogue of the cropped reconstructor grid.

    Kept EXACT (not bucketed): the row-gather rate cliffs once the
    table outgrows the on-chip cache, so a few extra crop planes cost
    more than a separate per-radius table build."""
    return min(size * pf, 2 * (pf * r_u + 2))


def _project_any(tab, cls, rot, rings, pf: int, mode_2d: bool, brick):
    """Dispatch slice projection to the corner-row gather or, when the
    round's rotation clouds are concentrated, the brick-mode wide-row
    gather (ops/brick.py).  ``brick`` is a static (span, stride, b)
    tuple or None."""
    if brick:
        from thunder_tpu.ops.brick import project_classed_brick

        span, stride, b = brick
        return project_classed_brick(tab, cls, rot, rings, pf, b, span,
                                     stride)
    return project_classed(tab, cls, rot, rings, pf, mode_2d)


@partial(jax.jit, static_argnames=("size", "pf", "mode_2d", "crop", "brick"))
def _prepare_projectee_stack(refs, size: int, pf: int, mode_2d: bool,
                             crop: int = 0, brick=None):
    """(K, size, ...) real-space refs -> gather-optimised padded
    corrected spectra (Projector::setProjectee per class,
    Model::refreshProj).  ``crop`` (0 = full) keeps only the centered
    region reachable at the current search radius.

    Storage tiers (fastest first, gated by table size):
    - Hermitian half-space corner-row tables (oct_pack_half): all
      2x2(x2) stencil corners as one gather row, kx >= 0 planes only
      with a conjugate fold at gather time (the reference's getFTHalf
      half-space storage, Volume.h:393-480) — one take per
      interpolation at 4x/2x the spectrum bytes, used while the table
      stays < ~1.5 GB.
    - bf16-packed ri words: 1 take per corner.
    - float32 ri split: full precision fallback for huge stacks.

    ``brick`` = (span, stride) builds a brick-mode table instead (see
    ops/brick.py) — chosen per round by Optimiser._brick_choice when
    the rotation clouds are concentrated enough."""
    from thunder_tpu.ops.projector import (oct_pack_half,
                                           prepare_projectee_3d_cropped,
                                           ri_split)

    big = size * pf
    if not mode_2d and crop and crop < big:
        # zoom-DFT band evaluation: never builds the (pf*size)^3 cube
        stack = jnp.stack([prepare_projectee_3d_cropped(refs[t], pf, crop)
                           for t in range(refs.shape[0])])
    else:
        prep = prepare_projectee_2d if mode_2d else prepare_projectee_3d
        stack = jnp.stack([prep(refs[t], pf).ft
                           for t in range(refs.shape[0])])
        if crop and crop < big:
            c, cc = big // 2, crop // 2
            nd = 2 if mode_2d else 3
            sl = (slice(None),) + tuple(
                slice(c - cc, c - cc + crop) for _ in range(nd))
            stack = stack[sl]
    if brick:
        from thunder_tpu.ops.brick import brick_pack_half

        span, stride = brick
        return brick_pack_half(ri_split(stack, pack_bf16=True), span,
                               stride)
    n_elem = 1
    for d in stack.shape:
        n_elem *= d
    n_corners = (4 if mode_2d else 8) // 2
    if n_elem * n_corners * 4 <= 1536 * 2**20:
        return oct_pack_half(ri_split(stack, pack_bf16=True), mode_2d)
    return ri_split(stack, pack_bf16=n_elem < 2**31)


@partial(jax.jit, static_argnames=("size", "pf", "mode_2d"))
def _global_block(proj_ft, rot_blk, i_col, i_row, dat_w, sctf2, a_term,
                  tra, baseline, size: int, pf: int, mode_2d: bool):
    """One (class, rotation-block) step of the scanned global search."""
    proj = Projectee(proj_ft, size, pf, size // 2 - 1)
    rings = _RingsView(i_col, i_row, size)
    pri = (project_2d if mode_2d else project_3d)(proj, rot_blk, rings)
    dvp = log_dvp_block(dat_w, sctf2, pri, tra, a_term)   # (l, mb, n)
    blk_max = jnp.max(dvp, axis=(1, 2))
    new_base = jnp.maximum(baseline, blk_max)
    scale = jnp.where(jnp.isfinite(baseline), jnp.exp(baseline - new_base), 0.0)
    w = jnp.exp(dvp - new_base[:, None, None])
    return new_base, scale, jnp.sum(w, axis=(1, 2)), jnp.sum(w, axis=2), jnp.sum(w, axis=1)


@partial(jax.jit, static_argnames=("size", "pf", "mode_2d"))
def _global_search(proj_stack, rot_blocks, i_col, i_row, dat_w, sctf2,
                   a_term, tra, size: int, pf: int, mode_2d: bool):
    """The whole scanned global search as one device program.

    rot_blocks: (n_blocks, block, d, d) rotation grid; the flash-
    attention-style scan keeps the running per-image baseline and the
    wC/wR/wT marginals across (class x rotation-block) steps
    (Optimiser.cpp:756-914's streaming log-sum-exp, one XLA program
    instead of K x n_blocks dispatches).
    """
    k_cls = proj_stack.shape[0]
    n_blocks, block = rot_blocks.shape[:2]
    n_img = dat_w.shape[0]
    n_trans = tra.shape[0]
    rings = _RingsView(i_col, i_row, size)

    def scan_class_dense(carry, proj_ri):
        baseline, w_c, w_t_all, w_r_all, i_class = carry

        def scan_block(carry, inp):
            rot_blk, b_idx = inp
            baseline, w_c, w_r_all, w_t_all = carry
            pri = project_ri(proj_ri, rot_blk, rings, pf, mode_2d)
            dvp = log_dvp_block(dat_w, sctf2, pri, tra, a_term)
            blk_max = jnp.max(dvp, axis=(1, 2))
            new_base = jnp.maximum(baseline, blk_max)
            scale = jnp.where(jnp.isfinite(baseline),
                              jnp.exp(baseline - new_base), 0.0)
            w = jnp.exp(dvp - new_base[:, None, None])
            w_c = w_c * scale[:, None]
            w_r_all = w_r_all * scale[None, :, None]
            w_t_all = w_t_all * scale[None, :, None]
            w_c = w_c.at[:, i_class].add(jnp.sum(w, axis=(1, 2)))
            w_r_cls = jax.lax.dynamic_slice(
                w_r_all, (i_class, 0, b_idx * block), (1, n_img, block)
            )[0]
            w_r_all = jax.lax.dynamic_update_slice(
                w_r_all, (w_r_cls + jnp.sum(w, axis=2))[None],
                (i_class, 0, b_idx * block),
            )
            w_t_all = w_t_all.at[i_class].add(jnp.sum(w, axis=1))
            return (new_base, w_c, w_r_all, w_t_all), None

        (baseline, w_c, w_r_all, w_t_all), _ = jax.lax.scan(
            scan_block,
            (baseline, w_c, w_r_all, w_t_all),
            (rot_blocks, jnp.arange(n_blocks)),
        )
        return (baseline, w_c, w_t_all, w_r_all, i_class + 1), None

    baseline = jnp.full((n_img,), -jnp.inf, jnp.float32)
    w_c = jnp.zeros((n_img, k_cls), jnp.float32)
    w_r = jnp.zeros((k_cls, n_img, n_blocks * block), jnp.float32)
    w_t = jnp.zeros((k_cls, n_img, n_trans), jnp.float32)
    (baseline, w_c, w_t, w_r, _), _ = jax.lax.scan(
        scan_class_dense, (baseline, w_c, w_t, w_r, jnp.zeros((), jnp.int32)),
        proj_stack,
    )
    return w_c, w_r, w_t


class _RingsView(NamedTuple):
    """Minimal PackedRings stand-in usable inside jit (static size)."""

    i_col: jax.Array
    i_row: jax.Array
    size: int


@partial(jax.jit, static_argnames=("size", "pixel_size"))
def _pack_inputs_jit(ft_masked, ctf_params, sigma, group_id, i_col, i_row,
                     i_sig, mask, size: int, pixel_size: float):
    """allocPreCal analogue as one program: gather ring pixels, CTF on
    the fly, per-group sigma lookup, precombined likelihood operands."""
    c = size // 2
    dat = ft_masked[..., c + i_row, c + i_col]
    ctf = ctf_packed(ctf_params, i_col, i_row, size, pixel_size)
    sig = sigma[group_id[:, None], i_sig[None, :]]
    sig_rcp = sigma_to_sig_rcp(sig) * mask
    dat_w = (sig_rcp * ctf).astype(jnp.complex64) * dat
    sctf2 = sig_rcp * ctf * ctf
    a_term = jnp.sum(sig_rcp * jnp.abs(dat) ** 2, axis=-1)
    return dat_w, sctf2, a_term


@partial(jax.jit, static_argnames=("n_shells", "want_avg"))
def _compare_refs(ref_a, ref_b, n_shells: int, fsc=None,
                  want_avg: bool = True):
    """FSC between hemisphere refs + conditional averaging below the
    0.95-crossing shell, for all classes at once
    (Model::compareTwoHemispheres, Model.cpp:307-851).

    ref_a/ref_b: (K, ...) real-space FFT-layout.  Returns
    (fsc (K, n_shells), averaged ref_a, averaged ref_b).

    ``fsc``: when given, the averaging shell is derived from THIS
    curve instead of one recomputed from the refs — the reference's
    avgFlag pass picks the shell from the stored pass-1 _FSC
    (MODEL_RESOLUTION_BASE_AVERAGE, AVERAGE_TWO_HEMISPHERE_THRES 0.95)
    while averaging the MAP-reconstructed halves."""
    nd = ref_a.ndim - 1
    axes = tuple(range(1, ref_a.ndim))
    fa = jnp.fft.fftshift(jnp.fft.fftn(ref_a, axes=axes), axes=axes)
    fb = jnp.fft.fftshift(jnp.fft.fftn(ref_b, axes=axes), axes=axes)

    size = ref_a.shape[-1]
    from thunder_tpu.ops.fourier import centered_shell_dev

    c0 = size // 2
    u = centered_shell_dev(size, nd)
    kx = (jnp.arange(size, dtype=jnp.int32) - c0).reshape((1,) * (nd - 1) + (size,))
    half = jnp.broadcast_to((kx >= 0) | (kx == -c0), (size,) * nd)
    u_cl = jnp.minimum(u, n_shells)

    if fsc is not None:
        pass
    elif nd == 3:
        # shell sums as per-z-plane one-hot matmuls (MXU) scanned over
        # z: TPU scatter-add runs ~0.1 Gelem/s, so the full-box
        # .at[].add was the measured cost at big boxes.  bf16 one-hot
        # is exact; bf16 values cost ~0.4% per-element error that
        # averages out over the 10^4-pixel shells — far below the FSC
        # thresholds' (0.95/0.143) sensitivity.
        def shell_sums3(val_list):
            k_cls = val_list[0].shape[0]
            vs = jnp.stack(val_list, 1)               # (K, 3, Z, Y, X)
            vs = jnp.where(half[None, None], vs, 0.0)
            vs = jnp.moveaxis(vs, 2, 0)               # (Z, K, 3, Y, X)

            def step(acc, inp):
                v_z, u_z = inp                        # (K,3,Y,X), (Y,X)
                oh = (u_z.reshape(-1)[:, None]
                      == jnp.arange(n_shells + 1)[None, :]).astype(
                          jnp.bfloat16)
                s = jnp.einsum(
                    "kcp,ps->kcs",
                    v_z.reshape(k_cls, 3, -1).astype(jnp.bfloat16), oh,
                    preferred_element_type=jnp.float32)
                return acc + s, None

            acc0 = jnp.zeros((k_cls, 3, n_shells + 1), jnp.float32)
            acc, _ = jax.lax.scan(step, acc0, (vs, u_cl))
            return [acc[:, i, :n_shells] for i in range(3)]

        num, pa, pb = shell_sums3([
            jnp.real(fa * jnp.conj(fb)), jnp.abs(fa) ** 2,
            jnp.abs(fb) ** 2,
        ])
    else:
        def shell_sum_batch(vals):
            vals = jnp.where(half, vals, 0.0)
            flat = vals.reshape(vals.shape[0], -1)
            out = jnp.zeros((vals.shape[0], n_shells + 1), flat.dtype)
            return out.at[:, u_cl.reshape(-1)].add(flat)[:, :n_shells]

        num = shell_sum_batch(jnp.real(fa * jnp.conj(fb)))
        pa = shell_sum_batch(jnp.abs(fa) ** 2)
        pb = shell_sum_batch(jnp.abs(fb) ** 2)
    if fsc is None:
        den = jnp.sqrt(pa * pb)
        fsc = jnp.where(den > 0, num / jnp.maximum(den, 1e-30), 0.0)
    else:
        fsc = jnp.asarray(fsc, jnp.float32)[:, :n_shells]

    if not want_avg:
        return fsc, None, None
    # averaging shell: last shell (from 1 up) with FSC > 0.95 before the
    # first crossing — computed branch-free per class
    below = fsc < 0.95
    below = below.at[:, 0].set(False)
    first_cross = jnp.argmax(below, axis=1)
    has_cross = jnp.any(below, axis=1)
    r_avg = jnp.where(has_cross, first_cross - 1, n_shells - 1)

    sel = u[None] <= r_avg[(...,) + (None,) * nd]
    avg = (fa + fb) / 2
    fa2 = jnp.where(sel, avg, fa)
    fb2 = jnp.where(sel, avg, fb)
    ia = jnp.real(jnp.fft.ifftn(jnp.fft.ifftshift(fa2, axes=axes), axes=axes))
    ib = jnp.real(jnp.fft.ifftn(jnp.fft.ifftshift(fb2, axes=axes), axes=axes))
    return fsc, ia, ib


@partial(jax.jit, static_argnames=("n_rot_out", "n_trans_out", "mode"))
def _adopt_global_jit(key, w_c, w_r, w_t, quats, trans, par_d, w_d, u_d,
                      n_rot_out: int, n_trans_out: int, mode: int):
    """Class draw + support adoption + clip + resample
    (Optimiser.cpp:925-1118)."""
    n_img = w_c.shape[0]
    w_c_cl = pt.clip_u_class(w_c)
    w_c_norm = w_c_cl / jnp.maximum(jnp.sum(w_c_cl, axis=-1, keepdims=True), 1e-30)
    kc, k1, k2 = jax.random.split(key, 3)
    cls = jax.random.categorical(kc, jnp.log(w_c_norm + 1e-30), axis=-1)

    n_rot = w_r.shape[-1]
    n_trans = w_t.shape[-1]
    u_r = w_r[cls, jnp.arange(n_img)]
    u_t = w_t[cls, jnp.arange(n_img)]

    par = pt.ParticleState(
        r=jnp.broadcast_to(quats, (n_img, n_rot, 4)),
        t=jnp.broadcast_to(trans, (n_img, n_trans, 2)),
        d=par_d,
        w_r=jnp.full((n_img, n_rot), 1.0 / n_rot),
        w_t=jnp.full((n_img, n_trans), 1.0 / n_trans),
        w_d=w_d, u_r=u_r, u_t=u_t, u_d=u_d,
        top_r=jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (n_img, 4)),
        top_t=jnp.zeros((n_img, 2)), top_d=par_d[:, 0],
        k1=jnp.ones((n_img,)), k2=jnp.ones((n_img,)), k3=jnp.ones((n_img,)),
        s0=jnp.ones((n_img,)), s1=jnp.ones((n_img,)),
        s_d=jnp.zeros((n_img,)), score=jnp.zeros((n_img,)),
    )
    par = pt.clip_u_r(par, mode)
    par = pt.clip_u_t(par)
    par = pt.resample_r(k1, par, n_rot_out)
    par = pt.resample_t(k2, par, n_trans_out)
    par = pt.cal_vari_r(par, mode)
    par = pt.cal_vari_t(par)
    return par, cls


def _phase_body(key, par: pt.ParticleState, cls, proj_stack, i_col, i_row,
                dat_w, sctf2, a_term, size: int, pf: int, mode: int,
                pf_small: float, trans_s: float, brick=None):
    """One particle-filter phase: perturb -> evaluate -> clip -> resample
    -> variance inference (Optimiser.cpp:1183-1614).  Traced helper."""
    mode_2d = mode == pt.MODE_2D
    kr, kt2, krs, kts = jax.random.split(key, 4)
    par = pt.perturb_r(kr, par, pf_small, mode)
    par = pt.perturb_t(kt2, par, pf_small, trans_s)

    rings = _RingsView(i_col, i_row, size)
    tra = translate_phases_view(i_col, i_row, size, par.t)
    if mode_2d:
        rot = rotate2d_from_unit(par.r[..., :2])
    else:
        rot = rotate3d(par.r)

    # gather only each image's own class (project_classed): K-fold
    # cheaper than projecting every class and selecting
    pri = _project_any(proj_stack, cls, rot, rings, pf, mode_2d, brick)

    dvp = log_dvp_local(dat_w, sctf2, pri, tra, a_term)   # (L, R, T)
    base = jnp.max(dvp, axis=(1, 2), keepdims=True)
    w = jnp.exp(dvp - base)
    u_r = jnp.einsum("lrt,lt->lr", w, par.w_t)
    u_t = jnp.einsum("lrt,lr->lt", w, par.w_r)
    par = par._replace(u_r=u_r, u_t=u_t)
    par = pt.clip_u_r(par, mode)
    par = pt.resample_r(krs, par, par.r.shape[1])
    par = pt.resample_t(kts, par, par.t.shape[1])
    par = pt.cal_vari_r(par, mode)
    par = pt.cal_vari_t(par)
    # s_d is untouched (constant) in non-CTF loops: the 4th stall stat
    # never fires there
    vari = (jnp.mean(par.k1), jnp.mean(par.s0), jnp.mean(par.s1),
            jnp.mean(par.s_d))
    return par, vari


@partial(jax.jit, static_argnames=("size", "pf", "mode", "pf_small",
                                   "trans_s", "brick"))
def _phase_step(key, par, cls, proj_stack, i_col, i_row, dat_w, sctf2,
                a_term, size: int, pf: int, mode: int, pf_small: float,
                trans_s: float, brick=None):
    return _phase_body(key, par, cls, proj_stack, i_col, i_row, dat_w,
                       sctf2, a_term, size, pf, mode, pf_small, trans_s,
                       brick)


def _adaptive_phase_loop(key, par: pt.ParticleState, body_fn,
                         min_phase, max_phase, init=None):
    """Bounded while_loop with the variance-stall stopping rule
    (Optimiser.cpp:1510-1614; PARTICLE_FILTER_DECREASE_FACTOR 0.95,
    N_PHASE_WITH_NO_VARI_DECREASE 1), shared by the plain and the
    CTF-search phase loops.
    ``body_fn(key, par) -> (par, (k1, s0, s1, s_d))`` — the stall
    vector includes the DEFOCUS variance (the reference's
    OPTIMISER_COMPRESS_CRITERIA stall checks variR/variT/variD,
    Optimiser.cpp:1556-1566 + Config.h:222): in CTF rounds the d
    variance keeps shrinking while the filter walks toward the true
    defocus, so stopping on rotation/translation stall alone cut the
    walk to ~3 phases and halved the recovered defocus error
    (measured: median d 1.007 vs the reference's 1.017 at 32px,
    BASELINE.md round-4 defocus diagnosis).
    Running the whole adaptive loop as ONE device program removes the
    per-phase host-device sync of a naive driver loop — the dominant
    cost on a remote-dispatch TPU.

    ``min_phase``/``max_phase`` are TRACED scalars and ``init`` an
    optional carried (phase, n_no_dec, (k1, s0, s1, s_d)) state, so the same
    compiled program can run the loop in chunks: the round driver stops
    at a chunk boundary, re-evaluates the projection-table mode against
    the tightened clouds (brick engagement mid-round), and resumes with
    identical stopping semantics."""
    f = PARTICLE_FILTER_DECREASE_FACTOR
    big = jnp.asarray(jnp.finfo(jnp.float32).max)

    def cond(state):
        _, _, phase, n_no_dec, _ = state
        return jnp.logical_and(
            phase < max_phase,
            jnp.logical_or(phase < min_phase,
                           n_no_dec < N_PHASE_WITH_NO_VARI_DECREASE),
        )

    def body(state):
        key, par, phase, n_no_dec, prev = state
        key, sub = jax.random.split(key)
        par, vari = body_fn(sub, par)
        k1, s0, s1, s_d = vari
        pk1, ps0, ps1, psd = prev
        decreased = (k1 < pk1 * f) | (s0 < ps0 * f) | (s1 < ps1 * f) | \
            (s_d < psd * f)
        # stalls only count once past the minimum phase count
        # (Optimiser.cpp:1510: the check sits inside `phase >= min`)
        n_no_dec = jnp.where(
            phase + 1 >= min_phase,
            jnp.where(decreased, 0, n_no_dec + 1),
            0,
        )
        return key, par, phase + 1, n_no_dec, (k1, s0, s1, s_d)

    if init is None:
        init = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                (big, big, big, big))
    phase0, n_no_dec0, prev0 = init
    state = (key, par, jnp.asarray(phase0, jnp.int32),
             jnp.asarray(n_no_dec0, jnp.int32),
             tuple(jnp.asarray(p, jnp.float32) for p in prev0))
    _, par, phase, n_no_dec, prev = jax.lax.while_loop(cond, body, state)
    return par, phase, n_no_dec, jnp.stack(prev)


@partial(jax.jit, static_argnames=("size", "pf", "mode", "pf_small",
                                   "trans_s", "brick"))
def _phase_loop(key, par: pt.ParticleState, cls, proj_stack, i_col, i_row,
                dat_w, sctf2, a_term, min_phase, max_phase, loop_state,
                size: int, pf: int, mode: int,
                pf_small: float, trans_s: float, brick=None):
    """The whole adaptive phase loop as ONE device program
    (Optimiser.cpp:1183-1614).  min/max phase and the carried stall
    state are dynamic so chunked resumption reuses this compilation."""
    def body_fn(sub, par):
        return _phase_body(sub, par, cls, proj_stack, i_col, i_row,
                           dat_w, sctf2, a_term, size, pf, mode,
                           pf_small, trans_s, brick)

    return _adaptive_phase_loop(key, par, body_fn, min_phase, max_phase,
                                loop_state)


def translate_phases_view(i_col, i_row, size, trans):
    phase = (2 * jnp.pi / size) * (
        i_col.astype(jnp.float32) * trans[..., 0:1]
        + i_row.astype(jnp.float32) * trans[..., 1:2]
    )
    return jax.lax.complex(jnp.cos(phase), -jnp.sin(phase))


def _phase_body_ctf(key, par: pt.ParticleState, cls, proj_stack, i_col, i_row,
                    dat_s, s_pack, a_term, ctf_base, size: int, pf: int,
                    mode: int, pf_small: float, trans_s: float,
                    pixel_size: float, brick=None):
    """CTF-search phase: additionally perturbs / evaluates / resamples
    the defocus-factor axis (SEARCH_TYPE_CTF, Optimiser.cpp:1252-1271
    on-the-fly CTF re-evaluation per defocus support point).

    dat_s  : (l, p) complex = sigRcp * dat
    s_pack : (l, p) float   = sigRcp
    ctf_base: CtfParams fields (l,) for the per-support re-evaluation.
    """
    from thunder_tpu.ops.likelihood import log_dvp_local_ctf
    from thunder_tpu.physics.ctf import ctf_packed_scaled

    mode_2d = mode == pt.MODE_2D
    kr, kt2, kdp, krs, kts, kds = jax.random.split(key, 6)
    par = pt.perturb_r(kr, par, pf_small, mode)
    par = pt.perturb_t(kt2, par, pf_small, trans_s)
    par = pt.perturb_d(kdp, par, pf_small)

    rings = _RingsView(i_col, i_row, size)
    tra = translate_phases_view(i_col, i_row, size, par.t)
    if mode_2d:
        rot = rotate2d_from_unit(par.r[..., :2])
    else:
        rot = rotate3d(par.r)
    pri = _project_any(proj_stack, cls, rot, rings, pf, mode_2d, brick)

    ctf_d = ctf_packed_scaled(ctf_base, i_col, i_row, size, pixel_size, par.d)
    dvp = log_dvp_local_ctf(dat_s, s_pack, ctf_d, pri, tra, a_term)  # (l,d,r,t)
    base = jnp.max(dvp, axis=(1, 2, 3), keepdims=True)
    w = jnp.exp(dvp - base)
    u_r = jnp.einsum("ldrt,lt,ld->lr", w, par.w_t, par.w_d)
    u_t = jnp.einsum("ldrt,lr,ld->lt", w, par.w_r, par.w_d)
    u_d = jnp.einsum("ldrt,lr,lt->ld", w, par.w_r, par.w_t)
    par = par._replace(u_r=u_r, u_t=u_t, u_d=u_d)
    par = pt.clip_u_r(par, mode)
    par = pt.resample_r(krs, par, par.r.shape[1])
    par = pt.resample_t(kts, par, par.t.shape[1])
    par = pt.resample_d(kds, par, par.d.shape[1])
    par = pt.cal_vari_r(par, mode)
    par = pt.cal_vari_t(par)
    par = pt.cal_vari_d(par)
    vari = (jnp.mean(par.k1), jnp.mean(par.s0), jnp.mean(par.s1),
            jnp.mean(par.s_d))
    return par, vari


@partial(jax.jit, static_argnames=("size", "pf", "mode", "pf_small",
                                   "trans_s", "pixel_size", "brick"))
def _phase_loop_ctf(key, par: pt.ParticleState, cls, proj_stack, i_col,
                    i_row, dat_s, s_pack, a_term, ctf_base, min_phase,
                    max_phase, loop_state, size: int,
                    pf: int, mode: int, pf_small: float, trans_s: float,
                    pixel_size: float, brick=None):
    """The CTF-search phase loop as ONE device program, same stall rule
    as the plain loop (the reference's CTF rounds share the phase-loop
    skeleton, Optimiser.cpp:1183-1614 with the :1252-1271 branch)."""
    def body_fn(sub, par):
        return _phase_body_ctf(sub, par, cls, proj_stack, i_col, i_row,
                               dat_s, s_pack, a_term, ctf_base, size, pf,
                               mode, pf_small, trans_s, pixel_size, brick)

    return _adaptive_phase_loop(key, par, body_fn, min_phase, max_phase,
                                loop_state)


@partial(jax.jit, static_argnames=("size", "pf", "mode_2d", "max_r",
                                   "n_group", "brick"))
def _sigma_step(dat, ctf, mask, i_col, i_row, i_sig, proj_stack, cls,
                top_r, top_t, dat_hi, mask_hi, i_sig_hi,
                group_id, valid,
                size: int, pf: int, mode_2d: bool, max_r: int,
                n_group: int, brick=None):
    """Rank-1 residual noise spectra over ALL shells (allReduceSigma,
    group mode; OPTIMISER_SIGMA_WHOLE_FREQUENCY default, Config.h:196).

    Shells below the reconstruction radius subtract the projected
    reference; shells above it use the plain data power — the
    references are Wiener-reconstructed only to that radius, so the
    projection there is zero by construction (and the projectee table
    stays at the search crop instead of the full padded box).

    ``valid`` (L,) masks the cyclic hemisphere-padding duplicates out of
    the group spectra — the reference's sums run over real particles
    only (Optimiser.cpp:6397-6709).  Returns the raw (sig_sum, cnt_sum)
    shell accumulators so host-resident stacks can stream image chunks
    (_sigma_final divides and applies the band)."""
    rings = _RingsView(i_col, i_row, size)
    if mode_2d:
        rot = rotate2d_from_unit(top_r[..., :2])
    else:
        rot = rotate3d(top_r)
    pri = _project_any(proj_stack, cls, rot[:, None], rings, pf,
                       mode_2d, brick)[:, 0]
    tra = translate_phases_view(i_col, i_row, size, top_t[:, None])[:, 0]
    resid = dat - ctf * tra * pri
    power = jnp.abs(resid) ** 2 * (mask * valid[:, None])
    power_hi = jnp.abs(dat_hi) ** 2 * (mask_hi * valid[:, None])

    shell = jnp.minimum(i_sig, max_r)
    shell_hi = jnp.minimum(i_sig_hi, max_r)
    sig_sum = jnp.zeros((n_group, max_r + 1), jnp.float32)
    cnt_sum = jnp.zeros((n_group, max_r + 1), jnp.float32)
    sig_sum = sig_sum.at[group_id[:, None], shell[None, :]].add(power / 2)
    cnt_sum = cnt_sum.at[group_id[:, None], shell[None, :]].add(
        jnp.broadcast_to(mask * valid[:, None], power.shape)
    )
    sig_sum = sig_sum.at[group_id[:, None], shell_hi[None, :]].add(
        power_hi / 2)
    cnt_sum = cnt_sum.at[group_id[:, None], shell_hi[None, :]].add(
        jnp.broadcast_to(mask_hi * valid[:, None], power_hi.shape)
    )
    return sig_sum, cnt_sum


@partial(jax.jit, static_argnames=("max_r",))
def _sigma_final(sig_sum, cnt_sum, sigma_prev, r_u, max_r: int):
    """Finalize group noise spectra from (possibly chunk-accumulated)
    shell sums."""
    sigma = sig_sum[..., :max_r] / jnp.maximum(cnt_sum[..., :max_r], 1.0)
    band = jnp.arange(max_r) < r_u
    return jnp.where(band, jnp.maximum(sigma, 1e-6), sigma_prev)


@partial(jax.jit, static_argnames=("size", "pf", "mode_2d", "max_r",
                                   "n_group", "pixel_size", "do_norm",
                                   "group_scl", "brick"))
def _max_stats_h(ft_ori, ctf_params, mask, i_col, i_row, i_sig,
                 hi_col, hi_row, hi_sig, hi_mask,
                 proj_stack, cls, top_r, top_t, group_id, valid,
                 sigma_prev, r_norm_lo, r_norm_hi, r_scl,
                 size: int, pf: int, mode_2d: bool, max_r: int,
                 n_group: int, pixel_size: float,
                 do_norm: bool, group_scl: bool, brick=None):
    """The whole maximization statistics stage — normCorrection
    (Optimiser.cpp:6201-6394), allReduceSigma (:6397-6709) and
    refreshScale/scaleDataVSPrior (:5749-6063, :10286) — as ONE device
    program over ONE rank-1 projection pass.

    The three stages share the projection at the top pose; the only
    coupling is that the reference rescales images (norm correction)
    BEFORE accumulating sigma.  With per-image shell-resolved
    d2 = sum |dat|^2, xa = sum Re(dat conj(m)), aa = sum |m|^2
    (m = ctf*tra*pri), the rescaled residual power is exact in closed
    form:  |s*dat - m|^2 summed = s^2*d2 - 2*s*xa + aa,   s from the
    norm-band median — so sigma-after-norm needs no second pass.

    Band membership is pixel-exact (both the rounded-shell and the
    squared-radius conditions of the reference's packing,
    Optimiser.cpp:8013-8025), with r_norm/r_scl traced so per-round
    radii don't recompile.

    Returns (sigma_new (2, n_group, max_r), s_norm (2, L),
    scale_g (2, n_group))."""
    c = size // 2
    n_sh = max_r + 1
    shell = jnp.minimum(i_sig, max_r)
    onehot = (shell[:, None] == jnp.arange(n_sh)).astype(jnp.float32)
    shell_hi = jnp.minimum(hi_sig, max_r)
    onehot_hi = (shell_hi[:, None] == jnp.arange(n_sh)).astype(jnp.float32)
    q = (i_col * i_col + i_row * i_row).astype(jnp.float32)
    norm_band = (mask
                 * (i_sig >= r_norm_lo) * (i_sig < r_norm_hi)
                 * (q >= r_norm_lo * r_norm_lo)
                 * (q < r_norm_hi * r_norm_hi))
    scl_band = mask * (i_sig < r_scl) * (q < r_scl * r_scl)
    rings = _RingsView(i_col, i_row, size)

    def one(ft, cp, ps, cl, tr, tt):
        dat = ft[..., c + i_row, c + i_col]
        dat_hi = ft[..., c + hi_row, c + hi_col]
        ctf = ctf_packed(cp, i_col, i_row, size, pixel_size)
        rot = (rotate2d_from_unit(tr[..., :2]) if mode_2d
               else rotate3d(tr))
        pri = _project_any(ps, cl, rot[:, None], rings, pf, mode_2d,
                           brick)[:, 0]
        tra = translate_phases_view(i_col, i_row, size, tt[:, None])[:, 0]
        m = ctf * tra * pri
        d2px = jnp.abs(dat) ** 2 * mask
        xapx = jnp.real(dat * jnp.conj(m)) * mask
        aapx = jnp.abs(m) ** 2 * mask
        d2 = d2px @ onehot + (jnp.abs(dat_hi) ** 2 * hi_mask) @ onehot_hi
        xa = xapx @ onehot
        aa = aapx @ onehot
        norm_l = jnp.sum((d2px - 2 * xapx + aapx) * norm_band, axis=-1)
        xa_l = jnp.sum(xapx * scl_band, axis=-1)
        aa_l = jnp.sum(aapx * scl_band, axis=-1)
        return d2, xa, aa, norm_l, xa_l, aa_l

    d2, xa, aa, norm_l, xa_l, aa_l = jax.vmap(one)(
        ft_ori, ctf_params, proj_stack, cls, top_r, top_t)

    if do_norm:
        med = jnp.nanmedian(jnp.where(valid > 0, norm_l, jnp.nan))
        s_norm = jnp.sqrt(med / jnp.maximum(norm_l, 1e-30))
    else:
        s_norm = jnp.ones_like(norm_l)

    # sigma on the (possibly) rescaled images, closed form
    s1 = s_norm[..., None]
    sig = s1 * s1 * d2 - 2 * s1 * xa + aa                 # (2, L, S)
    g_onehot = ((group_id[..., None] == jnp.arange(n_group))
                .astype(jnp.float32) * valid[..., None])  # (2, L, G)
    sig_sum = jnp.einsum("hlg,hls->hgs", g_onehot, sig) / 2
    cnt_shell = mask @ onehot + hi_mask @ onehot_hi       # (S,)
    g_cnt = jnp.sum(g_onehot, axis=1)                     # (2, G)
    cnt_sum = g_cnt[..., None] * cnt_shell
    sigma_new = _sigma_final(sig_sum, cnt_sum, sigma_prev,
                             jnp.asarray(max_r), max_r)

    # group intensity scale (refreshScale)
    if group_scl:
        xa_g = jnp.einsum("hlg,hl->hg", g_onehot, xa_l)
        aa_g = jnp.einsum("hlg,hl->hg", g_onehot, aa_l)
        scale_g = xa_g / jnp.maximum(aa_g, 1e-30)
    else:
        tot = (jnp.sum(xa_l * valid, axis=1)
               / jnp.maximum(jnp.sum(aa_l * valid, axis=1), 1e-30))
        scale_g = jnp.broadcast_to(tot[:, None], (2, n_group))
    return sigma_new, s_norm, scale_g


@partial(jax.jit, static_argnames=("size", "pf", "mode_2d", "n_sym",
                                   "grid_size", "kernel"))
def _insert_class(dat, ctf, mask, i_col, i_row, quats, trans, w_l,
                  sym_mats, max_radius_pad, size: int, pf: int,
                  mode_2d: bool, n_sym: int, grid_size: int | None = None,
                  kernel: str = "trilinear"):
    """Translate-align + scatter-insert one class's images into (F, T).

    ctf: (L, P) shared across draws, or (L, D, P) per-draw (defocus
    refinement path).  grid_size < size selects the cropped
    reconstructor grid (Model::resetReco): integer frequencies are
    identical, only the accumulation cube shrinks.
    """
    big = (grid_size or size) * pf
    tra = translate_phases_view(i_col, i_row, size, trans)      # (L, D, P)
    dat_al = dat[:, None, :] * jnp.conj(tra)
    ctf_d = ctf if ctf.ndim == 3 else ctf[:, None, :]
    # w_l (L,): per-image weight; (L, D): per-draw (compacted draws)
    w_b = w_l[:, :, None] if w_l.ndim == 2 else w_l[:, None, None]
    vals = dat_al * (ctf_d * mask) * w_b
    ctf2w = (ctf_d * ctf_d * mask) * w_b

    # scatter in draw chunks: the fused scatter materialises
    # (taps * L * chunk * P, 3) update rows, which at mReco=100 would
    # not fit HBM in one shot
    n_draw = vals.shape[1]
    if n_draw <= 8:
        chunk = n_draw
    else:
        chunk = next(c for c in (8, 7, 6, 5, 4, 3, 2, 1)
                     if n_draw % c == 0)

    if mode_2d:
        rot = rotate2d_from_unit(quats[..., :2])
        f_grid = jnp.zeros((big, big), jnp.complex64)
        t_grid = jnp.zeros((big, big), jnp.float32)
        insert_fn = partial(insert_slices_2d, i_col=i_col, i_row=i_row,
                            pf=pf, max_radius_pad=max_radius_pad)
    else:
        rot = rotate3d(quats)
        f_grid = jnp.zeros((big,) * 3, jnp.complex64)
        t_grid = jnp.zeros((big,) * 3, jnp.float32)
        insert_fn = partial(insert_slices_3d, i_col=i_col, i_row=i_row,
                            pf=pf, max_radius_pad=max_radius_pad,
                            kernel=kernel)

    if chunk == n_draw:
        f_grid, t_grid = insert_fn(f_grid, t_grid, vals, ctf2w, rot)
    else:
        n_chunks = n_draw // chunk
        ctf2w = jnp.broadcast_to(ctf2w, vals.shape)

        def r(x):
            return jnp.moveaxis(
                x.reshape(x.shape[0], n_chunks, chunk, *x.shape[2:]), 1, 0)

        def step(carry, inp):
            fg, tg = carry
            v, c2, ro = inp
            return insert_fn(fg, tg, v, c2, ro), None

        (f_grid, t_grid), _ = jax.lax.scan(
            step, (f_grid, t_grid), (r(vals), r(ctf2w), r(rot)))
    f_grid = hermitianize(f_grid)
    t_grid = hermitianize_real(t_grid)
    if not mode_2d and n_sym > 1:
        f_grid = symmetrize_ft(f_grid, sym_mats, max_radius_pad)
        t_grid = jnp.real(
            symmetrize_ft(t_grid.astype(jnp.complex64), sym_mats, max_radius_pad)
        )
    return f_grid, t_grid


@partial(jax.jit, static_argnames=("size", "pf", "mode_2d", "n_sym",
                                   "grid_size", "kernel"))
def _insert_all_classes(dat, ctf, mask, i_col, i_row, quats, trans, w_l_all,
                        sym_mats, max_radius_pad, size: int, pf: int,
                        mode_2d: bool, n_sym: int, grid_size: int,
                        kernel: str = "trilinear"):
    """All classes' insertions in one program (sequential over the
    one-hot class weights: each class materialises its own weighted
    copies of the draw batch, so a vmap would multiply peak memory by
    K — measured OOM at K=10, mReco=100, 160px)."""
    def one(w_l):
        return _insert_class(dat, ctf, mask, i_col, i_row, quats, trans,
                             w_l, sym_mats, max_radius_pad, size, pf,
                             mode_2d, n_sym, grid_size, kernel)

    return jax.lax.map(one, w_l_all)


@partial(jax.jit, static_argnames=("size", "pf", "pixel_size", "use_d",
                                   "r_u", "n_sym"))
def _dense_slices_h(ft_ori, ctf_params, quats, trans, d_draw, w_l_all,
                    sym_mats, size: int, pf: int, pixel_size: float,
                    use_d: bool, r_u: int, n_sym: int):
    """Dense full-plane slices for the volume-sharded inserter, with
    POSE-SIDE symmetrisation: each draw is repeated at R_s^-1-rotated
    poses, which equals symmetrising F/T after insertion (SYMMETRIZE_FT
    sums grid(R_s f)) without ever touching a full volume.

    Returns vals/ctf2w (2, L*D*S, nk, nk), rot (2, L*D*S, 3, 3),
    w_cls (2, K, L*D*S)."""
    c = size // 2
    nk = 2 * r_u - 1
    rr = r_u - 1
    kk = jnp.arange(nk, dtype=jnp.int32) - rr
    ky, kx = jnp.meshgrid(kk, kk, indexing="ij")
    vc, vr = kx.reshape(-1), ky.reshape(-1)
    q2 = (kx * kx + ky * ky).astype(jnp.float32)
    mask_d = (q2 < (r_u - 1) * (r_u - 1)).astype(jnp.float32)
    mask_d = mask_d * jnp.where(q2 == 0, 2.0, 1.0)

    def one(ft, cp, q, tr, dd, wl):
        n_img, n_draw = q.shape[0], q.shape[1]
        dat = jax.lax.dynamic_slice(
            ft, (0, c - rr, c - rr), (ft.shape[0], nk, nk))
        tra = translate_phases_view(vc, vr, size, tr)
        if use_d:
            ctf = ctf_packed_scaled(cp, vc, vr, size, pixel_size, dd)
        else:
            ctf = ctf_packed(cp, vc, vr, size, pixel_size)[:, None, :]
        vals = (dat.reshape(n_img, 1, -1) * jnp.conj(tra)
                * (ctf * mask_d.reshape(-1)))
        ctf2w = jnp.broadcast_to(ctf * ctf * mask_d.reshape(-1), vals.shape)
        rot = rotate3d(q)                               # (L, D, 3, 3)
        # symmetry expansion: R_s^{-1} @ R  (weights NOT divided —
        # SYMMETRIZE_FT sums the rotated copies)
        rot_s = jnp.einsum("sji,ldjk->lsdik", sym_mats, rot)
        vals_s = jnp.broadcast_to(vals[:, None],
                                  (n_img, n_sym) + vals.shape[1:])
        c2w_s = jnp.broadcast_to(ctf2w[:, None],
                                 (n_img, n_sym) + ctf2w.shape[1:])
        if wl.ndim == 3:
            # per-draw compacted weights (K, L, D) -> (K, L*S*D) in the
            # same (l, sym, d) flattening order as vals_s/rot_s
            wl_s = jnp.broadcast_to(
                wl[:, :, None, :],
                (wl.shape[0], n_img, n_sym, n_draw)).reshape(
                    wl.shape[0], -1)
        else:
            wl_s = jnp.repeat(wl, n_draw * n_sym, axis=1)   # (K, L*S*D)
        return (vals_s.reshape(-1, nk, nk), c2w_s.reshape(-1, nk, nk),
                rot_s.reshape(-1, 3, 3), wl_s)

    return jax.vmap(one)(ft_ori, ctf_params, quats, trans, d_draw,
                         w_l_all)


@partial(jax.jit, static_argnames=("mode", "fold_sym"))
def _finish_phases(par: pt.ParticleState, sym_quats, mode: int,
                   fold_sym: bool):
    """Score + asymmetric-unit folding after the phase loop, fused into
    one dispatch (calScore + Particle::symmetrise)."""
    par = pt.cal_score(par, mode)
    if fold_sym:
        from thunder_tpu.geometry.quaternion import quat_conj, quat_mul

        anchor = jnp.asarray([1.0, 0.0, 0.0, 0.0], par.top_r.dtype)
        sq = sym_quats.astype(par.top_r.dtype)
        cand = jax.vmap(lambda s: quat_mul(quat_conj(s), par.top_r))(sq)
        score = jnp.abs(jnp.einsum("o...q,q->o...", cand, anchor))
        best = jnp.argmax(score, axis=0)
        par = par._replace(
            top_r=jnp.take_along_axis(cand, best[None, ..., None], axis=0)[0]
        )
    return par


@partial(jax.jit, static_argnames=("mode_2d",))
def _recentre_refs(refs, o_class, mode_2d: bool):
    """Translate per-class references by -o (Fourier phase ramp on the
    centered spectrum; x/y only — the z offset is unobservable from 2D
    data, as in the reference's PG_CN-only branch)."""
    size = refs.shape[-1]
    c = size // 2
    k = jnp.arange(size, dtype=jnp.float32) - c
    nd = 2 if mode_2d else 3
    axes = tuple(range(1, nd + 1))
    ft = jnp.fft.fftshift(jnp.fft.fftn(refs, axes=axes), axes=axes)
    ox = o_class[:, 0]
    oy = o_class[:, 1]
    if mode_2d:
        phase = (2 * jnp.pi / size) * (
            k[None, None, :] * ox[:, None, None]
            + k[None, :, None] * oy[:, None, None]
        )
    else:
        phase = (2 * jnp.pi / size) * (
            k[None, None, None, :] * ox[:, None, None, None]
            + k[None, None, :, None] * oy[:, None, None, None]
        )
    # translate by -o: multiply by exp(+2 pi i f.o / N)
    ft = ft * jnp.exp(1j * phase).astype(ft.dtype)
    return jnp.real(jnp.fft.ifftn(jnp.fft.ifftshift(ft, axes=axes), axes=axes))


@partial(jax.jit, static_argnames=("grid_size", "pf", "max_radius",
                                   "map_wiener", "join_half", "grid_corr",
                                   "out_size", "kernel"))
def _reconstruct_all(f_all, t_all, fsc_all, grid_size: int, pf: int,
                     max_radius: int, map_wiener: bool, join_half: bool,
                     grid_corr: bool, out_size: int,
                     kernel: str = "trilinear"):
    """Per-class gridding reconstructions in one program, Fourier-
    upsampled to the output box when the grid was cropped."""
    def one(f_grid, t_grid, fsc_curve):
        vol = reconstruct(f_grid, t_grid, fsc_curve, grid_size, pf,
                          max_radius, map_wiener=map_wiener,
                          join_half=join_half, grid_corr=grid_corr,
                          kernel=kernel)
        if grid_size != out_size:
            vol = resize_rl(vol, out_size)
        return vol

    return jax.vmap(one)(f_all, t_all, fsc_all)


# ======================================================================
# hemisphere-stacked SPMD stages
# ======================================================================
# Every hot stage runs ONCE per round over BOTH hemispheres: inputs
# carry a leading hemi axis of size 2 and these wrappers vmap the
# per-hemisphere stage bodies above.  On a ("hemi", "data") mesh the
# stacked arrays are sharded P("hemi", "data", ...), so each jitted
# program IS the reference's process topology (src/Parallel.cpp:17-67):
# one mesh half computes hemisphere A, the other B, psum over "data"
# replaces MPI_Allreduce_Large + the GPU path's NCCL tier
# (Reconstructor.cpp:2350-2484, gpu/src/cuthunder.cu:297-345), and the
# cross-hemisphere FSC (_compare_refs) is the only point where the two
# halves meet (Model.cpp:307-851).  On a single device the size-2 batch
# simply fuses both hemispheres into one dispatch.


@partial(jax.jit, static_argnames=("size", "pf", "mode_2d", "crop",
                                   "brick"))
def _prepare_projectee_stack_h(refs, size: int, pf: int, mode_2d: bool,
                               crop: int = 0, brick=None):
    return jax.vmap(
        lambda r: _prepare_projectee_stack(r, size, pf, mode_2d, crop,
                                           brick)
    )(refs)


@partial(jax.jit, static_argnames=("size", "pixel_size"))
def _pack_inputs_h(ft_masked, ctf_params, sigma, group_id, i_col, i_row,
                   i_sig, mask, size: int, pixel_size: float):
    return jax.vmap(
        lambda ft, cp, sg, gi: _pack_inputs_jit(
            ft, cp, sg, gi, i_col, i_row, i_sig, mask, size, pixel_size)
    )(ft_masked, ctf_params, sigma, group_id)



def _hemi_map(one, seq: bool):
    """vmap over the hemisphere axis (SPMD lockstep, shardable on a
    ("hemi", "data") mesh) or lax.map (strictly sequential) — on a
    single chip the sequential form halves the gather working set (one
    hemisphere's projection table at a time stays under the ~96 MB
    row-gather cache cliff; measured in scripts/micro_gather*) and lets
    each hemisphere's adaptive phase loop run its own iteration count.
    """
    if seq:
        return lambda *args: jax.lax.map(lambda t: one(*t), args)
    return jax.vmap(one)


@partial(jax.jit, static_argnames=("size", "pf", "mode_2d", "seq"))
def _global_search_h(proj_stack, rot_blocks, i_col, i_row, dat_w, sctf2,
                     a_term, tra, size: int, pf: int, mode_2d: bool,
                     seq: bool = False):
    return _hemi_map(
        lambda ps, rb, dw, s2, at, tr: _global_search(
            ps, rb, i_col, i_row, dw, s2, at, tr, size, pf, mode_2d),
        seq,
    )(proj_stack, rot_blocks, dat_w, sctf2, a_term, tra)


@partial(jax.jit, static_argnames=("n_rot_out", "n_trans_out", "mode"))
def _adopt_global_h(keys, w_c, w_r, w_t, quats, trans, par_d, w_d, u_d,
                    n_rot_out: int, n_trans_out: int, mode: int):
    return jax.vmap(
        lambda k, wc, wr, wt, q, tr, pd, wd, ud: _adopt_global_jit(
            k, wc, wr, wt, q, tr, pd, wd, ud, n_rot_out, n_trans_out, mode)
    )(keys, w_c, w_r, w_t, quats, trans, par_d, w_d, u_d)


@partial(jax.jit, static_argnames=("size", "pf", "mode", "pf_small",
                                   "trans_s", "seq", "brick"))
def _phase_loop_h(keys, par, cls, proj_stack, i_col, i_row, dat_w, sctf2,
                  a_term, min_phase, max_phase, loop_state,
                  size: int, pf: int, mode: int, pf_small: float,
                  trans_s: float, seq: bool = False, brick=None):
    return _hemi_map(
        lambda k, p, c, ps, dw, s2, at, st: _phase_loop(
            k, p, c, ps, i_col, i_row, dw, s2, at, min_phase, max_phase,
            st, size, pf, mode, pf_small, trans_s, brick),
        seq,
    )(keys, par, cls, proj_stack, dat_w, sctf2, a_term, loop_state)


@partial(jax.jit, static_argnames=("size", "pf", "mode", "pf_small",
                                   "trans_s", "pixel_size", "seq",
                                   "brick"))
def _phase_loop_ctf_h(keys, par, cls, proj_stack, i_col, i_row, i_sig,
                      mask, ft_masked, sigma, group_id, ctf_base,
                      min_phase, max_phase, loop_state,
                      size: int, pf: int, mode: int, pf_small: float,
                      trans_s: float, pixel_size: float,
                      seq: bool = False, brick=None):
    """CTF loop wrapper; builds dat_s / sigRcp per hemisphere inside the
    program (the packing is re-derived from the raw spectra so the whole
    CTF round stays one dispatch)."""
    c = size // 2

    def one(k, p, cl, ps, ft, sg, gi, cb, st):
        dat = ft[..., c + i_row, c + i_col]
        sig = sg[gi[:, None], i_sig[None, :]]
        s_rcp = sigma_to_sig_rcp(sig) * mask
        dat_s = s_rcp.astype(jnp.complex64) * dat
        a_term = jnp.sum(s_rcp * jnp.abs(dat) ** 2, axis=-1)
        return _phase_loop_ctf(k, p, cl, ps, i_col, i_row, dat_s, s_rcp,
                               a_term, cb, min_phase, max_phase, st,
                               size, pf, mode, pf_small,
                               trans_s, pixel_size, brick)

    return _hemi_map(one, seq)(keys, par, cls, proj_stack, ft_masked,
                               sigma, group_id, ctf_base, loop_state)


@partial(jax.jit, static_argnames=("mode", "fold_sym"))
def _finish_phases_h(par, sym_quats, mode: int, fold_sym: bool):
    return jax.vmap(lambda p: _finish_phases(p, sym_quats, mode, fold_sym))(par)


@partial(jax.jit, static_argnames=("size", "pf", "mode_2d", "max_r",
                                   "n_group", "pixel_size", "brick"))
def _sigma_step_h(ft_ori, ctf_params, mask, i_col, i_row, i_sig,
                  hi_col, hi_row, hi_sig, hi_mask,
                  proj_stack, cls, top_r, top_t, group_id, valid,
                  size: int, pf: int, mode_2d: bool, max_r: int,
                  n_group: int, pixel_size: float, brick=None):
    """Both hemispheres' sigma shell accumulators for one image chunk:
    (sig_sum, cnt_sum), each (2, n_group, max_r + 1)."""
    c = size // 2

    def one(ft, cp, ps, cl, tr, tt, gi, va):
        dat = ft[..., c + i_row, c + i_col]
        dat_hi = ft[..., c + hi_row, c + hi_col]
        ctf = ctf_packed(cp, i_col, i_row, size, pixel_size)
        return _sigma_step(dat, ctf, mask, i_col, i_row, i_sig, ps, cl,
                           tr, tt, dat_hi, hi_mask, hi_sig,
                           gi, va, size, pf, mode_2d,
                           max_r, n_group, brick)

    return jax.vmap(one)(ft_ori, ctf_params, proj_stack, cls, top_r,
                         top_t, group_id, valid)


@partial(jax.jit, static_argnames=("size", "pf", "mode_2d", "pixel_size",
                                   "brick"))
def _resid_stats_h(ft_ori, ctf_params, proj_stack, cls, top_r, eff_t,
                   i_col, i_row, mask, size: int, pf: int, mode_2d: bool,
                   pixel_size: float, brick=None):
    """Rank-1 residual norms + scale cross/auto spectra sums, fused:
    normCorrection (Optimiser.cpp:6201-6394) and refreshScale /
    scaleDataVSPrior (:5749-6063, :10286) share the same rank-1
    projection, so both statistics come out of one program.

    Returns (norm (2, L), xa (2, L), aa (2, L))."""
    c = size // 2
    rings = _RingsView(i_col, i_row, size)

    def one(ft, cp, ps, cl, q, tt):
        dat = ft[..., c + i_row, c + i_col]
        ctf = ctf_packed(cp, i_col, i_row, size, pixel_size)
        rot = rotate2d_from_unit(q[..., :2]) if mode_2d else rotate3d(q)
        pri = _project_any(ps, cl, rot[:, None], rings, pf, mode_2d,
                           brick)[:, 0]
        tra = translate_phases_view(i_col, i_row, size, tt[:, None])[:, 0]
        prit = pri * tra
        resid = dat - ctf * prit
        norm = jnp.sum(jnp.abs(resid) ** 2 * mask, axis=-1)
        xa = jnp.sum(jnp.real(dat * jnp.conj(prit)) * ctf * mask, axis=-1)
        aa = jnp.sum(jnp.abs(prit) ** 2 * ctf * ctf * mask, axis=-1)
        return norm, xa, aa

    return jax.vmap(one)(ft_ori, ctf_params, proj_stack, cls, top_r, eff_t)


@partial(jax.jit, static_argnames=("n_draw",))
def _draw_poses_h(keys, par, n_draw: int):
    return jax.vmap(lambda k, p: pt.draw_poses(k, p, n_draw))(keys, par)


@partial(jax.jit, static_argnames=("s_d",))
def _init_d_round_h(key, par, s_d: float):
    """Per-CTF-round defocus support re-init (Particle::initD,
    Optimiser.cpp:1195-1196) — see pt.init_d_round."""
    return pt.init_d_round(key, par, s_d)


@partial(jax.jit, static_argnames=("n_draw", "n_slots"))
def _draw_poses_compact_h(keys, par, n_draw: int, n_slots: int):
    return jax.vmap(
        lambda k, p: pt.draw_poses_compact(k, p, n_draw, n_slots))(keys, par)


@partial(jax.jit, static_argnames=("size", "pf", "mode_2d", "n_sym",
                                   "grid_size", "pixel_size", "use_d",
                                   "r_u", "kernel"))
def _insert_all_h(ft_ori, ctf_params, mask, i_col, i_row, quats, trans,
                  d_draw, w_l_all, sym_mats, max_radius_pad, size: int,
                  pf: int, mode_2d: bool, n_sym: int, grid_size: int,
                  pixel_size: float, use_d: bool, r_u: int,
                  kernel: str = "trilinear"):
    """Both hemispheres' per-class insertions in one program; the CTF is
    evaluated inside (per-draw defocus-scaled when use_d).

    3D takes the scatter-free shear-sweep path (insert_sweep_3d) over
    dense full-plane slices; 2D keeps the packed scatter (small grids)."""
    c = size // 2

    def one_2d(ft, cp, q, tr, dd, wl):
        dat = ft[..., c + i_row, c + i_col] * mask
        if use_d:
            ctf = ctf_packed_scaled(cp, i_col, i_row, size, pixel_size, dd)
        else:
            ctf = ctf_packed(cp, i_col, i_row, size, pixel_size)
        return _insert_all_classes(dat, ctf, mask, i_col, i_row, q, tr, wl,
                                   sym_mats, max_radius_pad, size, pf,
                                   mode_2d, n_sym, grid_size, kernel)

    def one_2d_sweep(ft, cp, q, tr, dd, wl):
        from thunder_tpu.ops.insert import insert_sweep_2d

        nk = 2 * r_u - 1
        rr = r_u - 1
        kk = jnp.arange(nk, dtype=jnp.int32) - rr
        ky, kx = jnp.meshgrid(kk, kk, indexing="ij")
        vc, vr = kx.reshape(-1), ky.reshape(-1)
        q2 = (kx * kx + ky * ky).astype(jnp.float32)
        mask_d = (q2 < (r_u - 1) * (r_u - 1)).astype(jnp.float32)
        mask_d = mask_d * jnp.where(q2 == 0, 2.0, 1.0)

        n_img, n_draw = q.shape[0], q.shape[1]
        dat = jax.lax.dynamic_slice(
            ft, (0, c - rr, c - rr), (ft.shape[0], nk, nk))
        tra = translate_phases_view(vc, vr, size, tr)
        if use_d:
            ctf = ctf_packed_scaled(cp, vc, vr, size, pixel_size, dd)
        else:
            ctf = ctf_packed(cp, vc, vr, size, pixel_size)[:, None, :]
        vals = (dat.reshape(n_img, 1, -1) * jnp.conj(tra)
                * (ctf * mask_d.reshape(-1)))
        ctf2w = jnp.broadcast_to(ctf * ctf * mask_d.reshape(-1), vals.shape)
        rot = rotate2d_from_unit(q[..., :2])
        big = grid_size * pf
        w_cls = (wl.reshape(wl.shape[0], -1) if wl.ndim == 3
                 else jnp.repeat(wl, n_draw, axis=1))
        return insert_sweep_2d(
            vals.reshape(-1, nk, nk), ctf2w.reshape(-1, nk, nk),
            rot.reshape(-1, 2, 2), w_cls, big, pf,
        )

    def one_3d(ft, cp, q, tr, dd, wl):
        from thunder_tpu.ops.insert import insert_sweep_3d

        nk = 2 * r_u - 1
        rr = r_u - 1
        kk = jnp.arange(nk, dtype=jnp.int32) - rr
        ky, kx = jnp.meshgrid(kk, kk, indexing="ij")
        vc, vr = kx.reshape(-1), ky.reshape(-1)
        q2 = (kx * kx + ky * ky).astype(jnp.float32)
        # scatter-path parity: rings mask (shell < r_u) AND the inserter's
        # padded-radius cut |f| < r_u - 1 (Reconstructor.cpp's
        # QUAD < (maxRadius*pf)^2 check)
        mask_d = (q2 < (r_u - 1) * (r_u - 1)).astype(jnp.float32)
        # DC doubled: the half-space+hermitianize path counts it twice
        mask_d = mask_d * jnp.where(q2 == 0, 2.0, 1.0)

        n_img, n_draw = q.shape[0], q.shape[1]
        dat = jax.lax.dynamic_slice(
            ft, (0, c - rr, c - rr), (ft.shape[0], nk, nk))     # (L,nk,nk)
        rot = rotate3d(q)
        big = grid_size * pf
        # wl (K, L): uniform per-draw weight; (K, L, D): compacted
        # per-draw weights (draw_poses_compact) — both flatten (l, d)
        if wl.ndim == 2:
            wl = jnp.repeat(wl[:, :, None], n_draw, axis=2)      # (K,L,D)

        # image-chunked accumulation: the translated/CTF'd dense slices
        # (L, D, nk^2 complex64 + two f32 fields) reach multiple GB at
        # the reference's rU = r + maxR/3 reconstruction band (nk = 167
        # at 256px local rounds) — materializing them whole OOMs a
        # 16 GB chip.  Chunk images so the in-flight slice block stays
        # under ~256 MB; the big (K, big^3) accumulators dominate the
        # residency instead, as they must.
        lc = max(1, min(n_img, int(256e6 / max(n_draw * nk * nk * 24, 1))))
        n_chunks = (n_img + lc - 1) // lc
        padl = n_chunks * lc - n_img
        if padl:
            padfn = lambda a: jnp.pad(
                a, ((0, padl),) + ((0, 0),) * (a.ndim - 1))
            dat = padfn(dat)
            rot = padfn(rot)
            tr_p = padfn(tr)
            dd_p = padfn(dd)
            cp = jax.tree.map(padfn, cp)
            wl = jnp.pad(wl, ((0, 0), (0, padl), (0, 0)))  # 0-weight pads
        else:
            tr_p, dd_p = tr, dd

        def rc(a):
            return a.reshape((n_chunks, lc) + a.shape[1:])

        def step(acc, inp):
            dat_c, rot_c, tr_c, dd_c, cp_c, wl_c = inp
            tra = translate_phases_view(vc, vr, size, tr_c)
            if use_d:
                ctf = ctf_packed_scaled(cp_c, vc, vr, size, pixel_size,
                                        dd_c)
            else:
                ctf = ctf_packed(cp_c, vc, vr, size, pixel_size)[:, None]
            vals = (dat_c.reshape(lc, 1, -1) * jnp.conj(tra)
                    * (ctf * mask_d.reshape(-1)))            # (lc,D,nk2)
            ctf2w = jnp.broadcast_to(ctf * ctf * mask_d.reshape(-1),
                                     vals.shape)
            f_c, t_c = insert_sweep_3d(
                vals.reshape(-1, nk, nk), ctf2w.reshape(-1, nk, nk),
                rot_c.reshape(-1, 3, 3),
                wl_c.reshape(wl.shape[0], -1), big, pf,
                chunk=min(128, lc * n_draw),
            )
            return (acc[0] + f_c, acc[1] + t_c), 0.0

        acc0 = (jnp.zeros((wl.shape[0], big, big, big), jnp.complex64),
                jnp.zeros((wl.shape[0], big, big, big), jnp.float32))
        (f, t), _ = jax.lax.scan(
            step, acc0,
            (rc(dat), rc(rot), rc(tr_p), rc(dd_p),
             jax.tree.map(rc, cp), jnp.swapaxes(rc(
                 jnp.swapaxes(wl, 0, 1)), 1, 2)),
        )
        if n_sym > 1:
            f = jax.vmap(lambda g: symmetrize_ft(g, sym_mats,
                                                 max_radius_pad))(f)
            t = jnp.real(jax.vmap(lambda g: symmetrize_ft(
                g.astype(jnp.complex64), sym_mats, max_radius_pad))(t))
        return f, t

    if kernel == "mkb":
        one = one_2d
    else:
        one = one_2d_sweep if mode_2d else one_3d
    return jax.vmap(one)(ft_ori, ctf_params, quats, trans, d_draw, w_l_all)


@partial(jax.jit, static_argnames=("size", "pf", "n_sym", "grid_size",
                                   "pixel_size", "use_d", "r_u"))
def _insert_flat3d_h(ft, cp, quats, trans, d_draw, w_sl, img_idx,
                     sym_mats, max_radius_pad, size: int, pf: int,
                     n_sym: int, grid_size: int, pixel_size: float,
                     use_d: bool, r_u: int):
    """ONE hemisphere's insertion over a FLAT, globally compacted slice
    list (round-5 redesign of the 3D sweep path).

    The old image-major layout ((L, n_slots) with most slots zero-weight)
    made the sweep's cost proportional to L * n_slots even though the
    compacted draws leave a median of only 3-27 distinct slices per
    image (draw_poses_compact); and vmapping both hemispheres through
    the sweep doubled peak HBM, which at the rU-band grids (big >= 300)
    silently exhausted the chip and returned all-NaN grids.  Here the
    caller gathers only the valid slices across the whole hemisphere
    (quats (B, 4), w_sl (K, B), img_idx (B,)) into a bucketed static
    shape, and hemispheres run as separate sequential dispatches.

    Cost model parity: the reference's insertion work is
    nPxl(rU) x mReco per image (Reconstructor.cpp:569-866); the sweep's
    is n_slices x big^3 HBM traffic — flat compaction makes n_slices
    the true distinct-pose count.
    """
    from thunder_tpu.ops.insert import (
        _sweep_coeffs,
        _sweep_finalize,
        _sweep_finalize_case,
        _sweep_height_pass,
        _sweep_height_pass_v2,
        _sweep_sort_key,
        flat_chunk_budget,
        sweep_chunk_budget,
    )

    # The windowed/banded v2 kernel (r5) wins only when scan chunks are
    # nearly single-image (sorted draws share shear coefficients);
    # production chunk sizes span images and fall to its dense branch,
    # measured 2.3x slower than the plain dense sweep
    # (scripts/micro_insert_modes.py).  Opt-in until the windowed
    # branch beats v1 at production chunking.
    use_v2 = os.environ.get("THUNDER_INSERT_V2", "0") == "1"

    c = size // 2
    nk = 2 * r_u - 1
    rr = r_u - 1
    kk = jnp.arange(nk, dtype=jnp.int32) - rr
    ky, kx = jnp.meshgrid(kk, kk, indexing="ij")
    vc, vr = kx.reshape(-1), ky.reshape(-1)
    q2 = (kx * kx + ky * ky).astype(jnp.float32)
    # scatter-path parity: |f| < r_u - 1 cut (Reconstructor.cpp's
    # QUAD < (maxRadius*pf)^2) with the DC doubled as in the
    # half-space+fold path
    mask_d = (q2 < (r_u - 1) * (r_u - 1)).astype(jnp.float32)
    mask_d = (mask_d * jnp.where(q2 == 0, 2.0, 1.0)).reshape(-1)

    n_cls = w_sl.shape[0]
    ch = 3 * n_cls
    big = grid_size * pf
    n_flat = quats.shape[0]
    chunk = (flat_chunk_budget(big) if use_v2
             else sweep_chunk_budget(big, 128 if big < 256 else 64, 2.5e9))
    n_chunks = (n_flat + chunk - 1) // chunk
    padb = n_chunks * chunk - n_flat
    if padb:
        padfn = lambda a: jnp.pad(a, ((0, padb),) + ((0, 0),) * (a.ndim - 1))
        quats = padfn(quats).at[n_flat:, 0].set(1.0)   # unit quat pads
        trans = padfn(trans)
        d_draw = jnp.pad(d_draw, (0, padb), constant_values=1.0)
        img_idx = jnp.pad(img_idx, (0, padb))
        w_sl = jnp.pad(w_sl, ((0, 0), (0, padb)))      # 0-weight pads
    rot = rotate3d(quats)
    coeffs = _sweep_coeffs(rot, pf)
    if use_v2:
        # sort by (height case, shear coefficients) so the windowed
        # height pass engages on nearly every chunk (_sweep_sort_key)
        order_s, _, _, _ = _sweep_sort_key(coeffs)
        trans = trans[order_s]
        d_draw = d_draw[order_s]
        img_idx = img_idx[order_s]
        w_sl = w_sl[:, order_s]
        coeffs = jax.tree.map(lambda a: a[order_s], coeffs)

    dat = jax.lax.dynamic_slice(
        ft, (0, c - rr, c - rr), (ft.shape[0], nk, nk))     # (L, nk, nk)

    r_h = nk // 2
    hh = jnp.arange(nk, dtype=jnp.float32) - r_h
    gg = jnp.arange(big, dtype=jnp.float32) - big // 2

    def rc(a):
        return a.reshape((n_chunks, chunk) + a.shape[1:])

    def step(acc, inp):
        idx_c, tr_c, dd_c, w_c, co = inp
        dat_c = jnp.take(dat, idx_c, axis=0).reshape(chunk, -1)
        cp_c = jax.tree.map(lambda a: a[idx_c], cp)
        tra = translate_phases_view(vc, vr, size, tr_c)
        if use_d:
            ctf = ctf_packed_scaled(cp_c, vc, vr, size, pixel_size,
                                    dd_c[:, None])[:, 0]
        else:
            ctf = ctf_packed(cp_c, vc, vr, size, pixel_size)
        vals = dat_c * jnp.conj(tra) * (ctf * mask_d)
        ctf2w = ctf * ctf * mask_d
        hp = _sweep_height_pass_v2 if use_v2 else _sweep_height_pass
        acc = hp(
            acc, vals.reshape(chunk, nk, nk),
            ctf2w.reshape(chunk, nk, nk), w_c, co, ch, chunk, nk, hh, gg)
        return acc, 0.0

    acc0 = jnp.zeros((3, big, big, ch, big) if use_v2
                     else (big, big, 3 * ch, big), jnp.float32)
    acc, _ = jax.lax.scan(
        step, acc0,
        (rc(img_idx), rc(trans), rc(d_draw), rc(w_sl.T),
         jax.tree.map(rc, coeffs)),
    )
    f, t = (_sweep_finalize_case if use_v2 else _sweep_finalize)(
        acc, n_cls, big)
    if n_sym > 1:
        f = jax.vmap(lambda g: symmetrize_ft(g, sym_mats,
                                             max_radius_pad))(f)
        t = jnp.real(jax.vmap(lambda g: symmetrize_ft(
            g.astype(jnp.complex64), sym_mats, max_radius_pad))(t))
    return f, t


@jax.jit
def _flat_slice_order_h(w_sl_total):
    """Per-hemisphere compaction order and count for the flat inserter:
    w_sl_total (2, L, S) total insertion weight per slot -> (order
    (2, L*S) valid-first stable permutation, n_valid (2,))."""
    flat = w_sl_total.reshape(w_sl_total.shape[0], -1)
    valid = flat > 0
    order = jnp.argsort(~valid, axis=1, stable=True).astype(jnp.int32)
    return order, jnp.sum(valid, axis=1)


@partial(jax.jit, static_argnames=("grid_size", "pf", "max_radius",
                                   "map_wiener", "join_half", "grid_corr",
                                   "out_size", "kernel"))
def _reconstruct_all_h(f2, t2, fsc_all, grid_size: int, pf: int,
                       max_radius: int, map_wiener: bool, join_half: bool,
                       grid_corr: bool, out_size: int,
                       kernel: str = "trilinear"):
    """Per-hemisphere, per-class gridding reconstructions; the FSC curve
    (previous round's, shared by both halves as in Model::_FSC) rides
    along unbatched."""
    return jax.vmap(
        lambda f, t: _reconstruct_all(f, t, fsc_all, grid_size, pf,
                                      max_radius, map_wiener, join_half,
                                      grid_corr, out_size, kernel)
    )(f2, t2)


@partial(jax.jit, static_argnames=("grid_size", "pf", "max_radius",
                                   "out_size", "kernel"))
def _reconstruct_two_h(f2, t2, fsc_all, grid_size: int, pf: int,
                       max_radius: int, out_size: int,
                       kernel: str = "trilinear"):
    """Both of the reference's per-round reconstruction passes (MAP-free
    FSC pass + join-half Wiener MAP pass) for every hemisphere and
    class in ONE program — one dispatch per round instead of two.
    ``fsc_all`` is the PREVIOUS round's curve (reco FSC re-arms at
    round end, Optimiser.cpp:4071)."""
    from thunder_tpu.recon.reconstructor import reconstruct_two_pass

    def one(f_grid, t_grid, fsc_curve):
        a, b = reconstruct_two_pass(f_grid, t_grid, fsc_curve, grid_size,
                                    pf, max_radius, True, True, kernel)
        if grid_size != out_size:
            a = resize_rl(a, out_size)
            b = resize_rl(b, out_size)
        return a, b

    return jax.vmap(lambda f, t: jax.vmap(one)(f, t, fsc_all))(f2, t2)


@jax.jit
def _apply_mask_jit(refs, w):
    return refs * w[None, None]


@jax.jit
def _round_stats_h(prev_top_r, top_r, s0, s1, valid):
    """Per-round monitoring statistics in ONE device program + ONE
    scalar-vector fetch (three separate host fetches of medians cost a
    measured ~110 ms/round through the remote-dispatch tunnel):
    median |<q_prev, q_top>| (refreshRotationChange,
    Optimiser.cpp:3767 + Particle::diffTopR) and the median
    translation variances (refreshVariance, Optimiser.cpp:5740).
    ``valid`` masks the cyclic hemisphere-padding duplicates — the
    reference's statistics run over real particles only."""
    dot = jnp.abs(jnp.sum(prev_top_r * top_r, axis=-1))
    nan = jnp.float32(jnp.nan)
    bad = valid <= 0
    return jnp.stack([
        jnp.nanmedian(jnp.where(bad, nan, dot)),
        jnp.nanmedian(jnp.where(bad, nan, s0)),
        jnp.nanmedian(jnp.where(bad, nan, s1)),
    ])


@jax.jit
def _spread_q98_h(q, valid):
    """98th-percentile angular deviation (radians) of each image's
    rotation support points from its mean quaternion — the scalar the
    brick-rung ladder keys on (ops/brick.py).  Device-side so the
    chunked phase driver fetches ONE float alongside the stall state
    instead of pulling the whole (2, L, R, 4) cloud (~0.5 MB + a
    tunnel round-trip per chunk boundary)."""
    ref_q = q[..., :1, :]
    q = q * jnp.sign(jnp.sum(q * ref_q, axis=-1, keepdims=True) + 1e-30)
    qm = jnp.mean(q, axis=2)
    qm = qm / jnp.maximum(
        jnp.linalg.norm(qm, axis=-1, keepdims=True), 1e-9)
    dot = jnp.clip(jnp.abs(jnp.sum(q * qm[..., None, :], axis=-1)), 0, 1)
    dev = 2.0 * jnp.arccos(dot)                          # (2, L, R)
    dev = jnp.where((valid <= 0)[..., None], jnp.nan, dev)
    return jnp.nanquantile(dev, 0.98)


@jax.jit
def _spread_per_image_h(q, valid):
    """Per-IMAGE 98th-percentile angular deviation (radians) of each
    image's rotation support points from its mean quaternion ->
    (2, L).  The statistic behind per-image TABLE ROUTING: a round
    whose whole-batch spread is blown up by a few rejuvenated clouds
    (the measured ~2% tail, particle.draw_poses_compact docstring) can
    still run the tight majority on the brick table, sending only the
    outlier images through the corner-row gather.  Invalid (hemisphere
    cyclic-padding) images report 0 so they always sort into the main
    batch."""
    ref_q = q[..., :1, :]
    q = q * jnp.sign(jnp.sum(q * ref_q, axis=-1, keepdims=True) + 1e-30)
    qm = jnp.mean(q, axis=2)
    qm = qm / jnp.maximum(
        jnp.linalg.norm(qm, axis=-1, keepdims=True), 1e-9)
    dot = jnp.clip(jnp.abs(jnp.sum(q * qm[..., None, :], axis=-1)), 0, 1)
    dev = 2.0 * jnp.arccos(dot)                          # (2, L, R)
    dev = jnp.quantile(dev, 0.98, axis=-1)               # (2, L)
    return jnp.where(valid > 0, dev, 0.0)


@jax.jit
def _take_l(tree, idx):
    """Gather images (axis 1) of every (2, L, ...) leaf by the
    per-hemisphere index (2, n) — the routing split/merge primitive."""
    def take(a):
        ix = idx.reshape(idx.shape + (1,) * (a.ndim - 2))
        return jnp.take_along_axis(a, ix.astype(jnp.int32), axis=1)

    return jax.tree.map(take, tree)


@partial(jax.jit, static_argnames=("k",))
def _class_distr_h(cls, valid, k: int):
    """Per-class particle fraction over valid images
    (refreshClassDistr, Optimiser.cpp:5484): one K-vector instead of a
    host pull of the full per-image class array."""
    one_hot = (cls[..., None] == jnp.arange(k)).astype(jnp.float32)
    cnt = jnp.sum(one_hot * valid[..., None], axis=(0, 1))
    return cnt / jnp.maximum(jnp.sum(valid), 1.0)


@jax.jit
def _sync_scalar_h(*arrs):
    """Tiny real-scalar reduction over live state leaves; fetching its
    result is the execution barrier used by Optimiser._sync_device."""
    tot = jnp.zeros((), jnp.float32)
    for a in arrs:
        tot = tot + jnp.real(jnp.ravel(a)[0]).astype(jnp.float32)
    return tot


@partial(jax.jit, static_argnames=("mode_2d",))
def _recentre_refs_h(refs, o_class, mode_2d: bool):
    return jax.vmap(lambda r, o: _recentre_refs(r, o, mode_2d))(refs, o_class)


@partial(jax.jit, static_argnames=("size",))
def _remask_ifft_h(ft_ori, offset, size: int):
    """First half of reMaskImg: offset-translate and return real space."""
    from thunder_tpu.ops.fourier import ifft2_centered

    c = size // 2
    k = jnp.arange(size, dtype=jnp.float32) - c
    phase = (2 * jnp.pi / size) * (
        k[None, None, None, :] * offset[..., 0, None, None]
        + k[None, None, :, None] * offset[..., 1, None, None]
    )
    shifted = ft_ori * jnp.exp(-1j * phase).astype(jnp.complex64)
    return ifft2_centered(shifted)


@partial(jax.jit, static_argnames=("size", "mask_radius_px"))
def _remask_fft_h(rl, size: int, mask_radius_px: float):
    """Second half of reMaskImg: soft-mask and return to Fourier."""
    from thunder_tpu.constants import EDGE_WIDTH_RL
    from thunder_tpu.ops.fourier import fft2_centered
    from thunder_tpu.physics.mask import soft_mask_weight

    w = jnp.asarray(soft_mask_weight(size, 2, mask_radius_px, EDGE_WIDTH_RL))
    return fft2_centered(rl * w[None, None]).astype(jnp.complex64)


def _remask_h(ft_ori, offset, size: int, mask_radius_px: float):
    """Rebuild soft-masked spectra from offset-translated originals
    (reMaskImg, Optimiser.cpp:6093-6149), both hemispheres at once.

    Split into TWO dispatches on purpose: fusing both batched FFTs into
    one program makes XLA:CPU's layout assignment feed the second FFT a
    transposed operand on a (hemi, data)-sharded batch — its fft thunk
    RET_CHECKs dim0-major input (found by the routed multi-chip dryrun,
    which was the first to drive a LOCAL round over a mesh).  The jit
    boundary pins the intermediate to the default layout; the stage
    runs once per round, so the extra dispatch is noise."""
    return _remask_fft_h(_remask_ifft_h(ft_ori, offset, size),
                         size, mask_radius_px)


@partial(jax.jit, static_argnames=("size", "pf", "mode_2d", "pixel_size"))
def _subtract_batch(ft_ori, ctf_params, proj_stack, cls, top_r, eff_t,
                    size: int, pf: int, mode_2d: bool, pixel_size: float):
    """Batched signal subtraction (saveSubtract, Optimiser.cpp:8418):
    dat - ctf * translate(proj(masked ref at rank-1 pose)) for a chunk
    of images, as one program (replacing the O(N)-dispatch host loop)."""
    from thunder_tpu.ops.fourier import ifft2_centered
    from thunder_tpu.physics.ctf import ctf_image

    c = size // 2
    k = jnp.arange(size, dtype=jnp.int32) - c
    ky, kx = jnp.meshgrid(k, k, indexing="ij")
    view = _RingsView(kx.reshape(-1), ky.reshape(-1), size)
    rot = (rotate2d_from_unit(top_r[..., :2]) if mode_2d
           else rotate3d(top_r))
    pri = project_classed(proj_stack, cls, rot[:, None], view, pf,
                          mode_2d)[:, 0]
    inside = ((kx * kx + ky * ky) < (size // 2 - 1) ** 2).reshape(-1)
    pri = jnp.where(inside[None, :], pri, 0.0)
    tra = translate_phases_view(view.i_col, view.i_row, size,
                                eff_t[:, None])[:, 0]
    pri = (pri * tra).reshape(-1, size, size)
    ctf_full = ctf_image(ctf_params, size, pixel_size)
    return ifft2_centered(ft_ori - ctf_full * pri)


# ======================================================================
# host-side orchestration
# ======================================================================


class HostFt:
    """Host-resident original spectra with a lazily-applied per-image
    intensity scale — bounded HBM residency for large stacks.

    The reference keeps each rank's original images in HOST memory and
    re-packs them per stage (allocPreCal, Optimiser.cpp:8043); keeping
    ``ft_ori`` on host likewise halves device residency (at
    reference-scale 100k x 256px the second device copy alone is
    ~6.5 GB/chip on an 8-way mesh).  Stages stream L-chunks through
    ``chunk``; intensity corrections (normCorrection / correctScale)
    fold into ``scale`` instead of rewriting the 10s-of-GB array."""

    def __init__(self, data: np.ndarray):
        self.data = np.asarray(data)            # (2, L, size, size) c64
        self.scale = np.ones(self.data.shape[:2], np.float32)

    @property
    def shape(self):
        return self.data.shape

    def chunk(self, sl: slice) -> jax.Array:
        return jnp.asarray(self.data[:, sl]
                           * self.scale[:, sl, None, None])

    def get(self, h: int, sl: slice) -> jax.Array:
        return jnp.asarray(self.data[h, sl]
                           * self.scale[h, sl, None, None])


class StackedData(NamedTuple):
    """Both hemispheres' images, stacked on a leading axis of size 2
    (hemisphere A = index 0, B = 1 — the reference's odd/even rank
    split, src/Parallel.cpp:34-35).  Arrays are padded so both
    hemispheres hold the same L (and L divides the data-axis size on a
    mesh); ``Optimiser.valid`` marks the real entries."""

    ft_masked: jax.Array       # (2, L, size, size) complex64
    ft_ori: jax.Array          # (2, L, size, size) complex64
    ctf_params: CtfParams      # fields (2, L)
    group_id: jax.Array        # (2, L) int32


@dataclass
class StackedState:
    refs: jax.Array            # (2, K, size, size[, size]) real space
    sigma: jax.Array           # (2, n_group, max_r)
    par: pt.ParticleState      # fields (2, L, ...)
    cls: jax.Array             # (2, L)
    refs_version: int = 0      # bumped on every refs rebind (cache key)

    def __setattr__(self, name, value):
        # every functional update rebinds `refs`; the version counter
        # keys the projection-table cache so a stale table can never
        # outlive the references it was built from
        if name == "refs" and "refs" in self.__dict__:
            object.__setattr__(self, "refs_version", self.refs_version + 1)
        object.__setattr__(self, name, value)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class Optimiser:
    """Host orchestration of one refinement/classification run.

    All device state carries a leading hemisphere axis of size 2 and
    every hot stage runs as ONE hemi-stacked jitted program (see the
    SPMD wrapper section above).  ``mesh`` may provide axes "hemi"
    and/or "data": arrays are placed so the partitioner runs hemisphere
    A on one mesh half and B on the other with images sharded along
    "data" — the reference's whole MPI topology (Parallel.cpp:17-67)
    as one SPMD program.  Round-level control (resolution cutoffs,
    search-type state machine, class balancing) stays on host, exactly
    as the reference's master rank does (Optimiser.cpp:3561-4364).
    """

    def __init__(self, cfg: ThunderConfig, images: np.ndarray | None,
                 ctf: CtfParams, group_id: np.ndarray,
                 init_refs: np.ndarray | None = None,
                 key: jax.Array | None = None,
                 hemi_of: np.ndarray | None = None,
                 resume_thu=None, mesh=None, image_loader=None):
        """resume_thu: a ThuTable carrying saved poses; used when
        cfg.g_search is False to rebuild each image's particle cloud
        around its checkpointed pose (loadParticles, Optimiser.cpp:5312
        + Particle::load).

        image_loader: per-host sharded ingest (the reference's per-rank
        chunk reads, Database.cpp:207-254,621): a callable
        ``loader(flat_ids) -> (len, size, size) float32`` invoked with
        ONLY the global rows this process's mesh devices address;
        ``images`` may then be None and no process materializes the
        full stack."""
        self.cfg = cfg
        self.key = key if key is not None else jax.random.PRNGKey(cfg.seed)
        self.sym = Symmetry(cfg.sym) if not cfg.mode_2d else Symmetry("C1")
        self.mode = pt.MODE_2D if cfg.mode_2d else pt.MODE_3D
        n = group_id.shape[0] if images is None else images.shape[0]
        if n < 2:
            raise ValueError("need at least one image per hemisphere")
        if hemi_of is None:
            hemi_of = np.arange(n) % 2
        self.hemi_of = hemi_of
        self.n_total = n
        self.n_group = int(group_id.max()) + 1 if n else 1
        self.mesh = mesh

        # MKB insertion cannot ride the volume-sharded sweep (the sweep
        # kernel is a sheared product of separable 1D hats; the radial
        # MKB blob is not separable, Reconstructor.cpp:424-567's scatter
        # path is whole-grid) — refuse at CONFIG time rather than
        # silently falling back to whole-volume grids at big boxes
        # (VERDICT r4 missing #4; DESIGN.md "MKB and volume sharding")
        if (cfg.reco_kernel == "mkb" and not cfg.mode_2d
                and mesh is not None and "data" in mesh.axis_names
                and mesh.shape["data"] > 1
                and (cfg.size * cfg.pf) ** 3 * 8 / 2 ** 20
                >= cfg.vol_shard_min_mb):
            raise ValueError(
                "reco_kernel='mkb' is incompatible with volume-sharded "
                "reconstruction (grids this size shard over the data "
                "axis; the MKB blob is not separable over the sweep's "
                "1D passes).  Use reco_kernel='trilinear' (the "
                "reference default, Config.h:97), or raise "
                f"vol_shard_min_mb above {(cfg.size * cfg.pf) ** 3 * 8 // 2 ** 20} "
                "to keep whole-volume grids per device.")

        # shardings from the mesh (either axis may be absent)
        self._sh_img = None
        self._sh_state = None
        data_size = 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axes = mesh.axis_names
            hemi_ax = "hemi" if "hemi" in axes else None
            data_ax = "data" if "data" in axes else None
            if data_ax:
                data_size = mesh.shape[data_ax]
            self._sh_img = lambda extra: NamedSharding(
                mesh, P(hemi_ax, data_ax, *([None] * extra)))
            self._sh_state = lambda extra: NamedSharding(
                mesh, P(hemi_ax, *([None] * extra)))

        self.model = ModelState(
            n_class=cfg.k, size=cfg.size, pixel_size=cfg.pixel_size,
            r_init=cfg.r_init, r_global=cfg.r_global, max_r=cfg.max_r,
            l_search=cfg.l_search, c_search=cfg.c_search,
        )
        if not cfg.g_search:
            self.model.search_type = SEARCH_TYPE_LOCAL
            self.model.r = min(cfg.max_r, max(self.model.r, cfg.r_global))

        # hemisphere split, padded to a common (data-divisible) L; pads
        # repeat real images cyclically and carry zero insertion weight
        sel = [np.nonzero(hemi_of == h)[0] for h in (0, 1)]
        if min(len(s) for s in sel) == 0:
            raise ValueError("a hemisphere is empty; both halves need images")
        L = _round_up(max(len(s) for s in sel), data_size)
        self.index = np.stack([np.resize(s, L) for s in sel])
        self.valid = np.stack([np.arange(L) < len(s) for s in sel])
        self.n_img = L

        # auto-size HBM residency BEFORE materializing device stacks:
        # a reference-scale run (100k x 256px) must not require the
        # user to know framework-extra knobs (VERDICT r3 #6)
        self.residency_plan = self._plan_residency()

        flat = self.index.reshape(-1)
        s2 = (2, L, cfg.size, cfg.size)
        if image_loader is not None and mesh is not None:
            from thunder_tpu.parallel.ingest import (
                assemble_global,
                local_block,
                process_local_rows,
            )

            mask2d = process_local_rows(mesh, L)
            h_sl, l_sl = local_block(mask2d)
            ids = self.index[h_sl, l_sl]
            self.local_rows = (h_sl, l_sl)
            self.n_local_loaded = ids.size
            imgs_local = np.asarray(image_loader(ids.reshape(-1)))
            prep = preprocess_images(
                jnp.asarray(imgs_local),
                cfg.mask_radius / cfg.pixel_size, zero_mask=cfg.zero_mask,
            )
            blk = (ids.shape[0], ids.shape[1], cfg.size, cfg.size)
            ft_masked = assemble_global(
                np.asarray(prep.ft_masked).reshape(blk), mesh, s2)
            ft_ori = assemble_global(
                np.asarray(prep.ft_ori).reshape(blk), mesh, s2)
        else:
            prep = preprocess_images(
                jnp.asarray(np.asarray(images)[flat]),
                cfg.mask_radius / cfg.pixel_size, zero_mask=cfg.zero_mask,
            )
            ft_masked = prep.ft_masked.reshape(s2)
            ft_ori = prep.ft_ori.reshape(s2)
        if cfg.host_ft_ori:
            ft_ori = HostFt(np.asarray(ft_ori))
        self.data = StackedData(
            ft_masked=ft_masked,
            ft_ori=ft_ori,
            ctf_params=CtfParams(
                *[jnp.asarray(np.asarray(f)[flat].reshape(2, L))
                  for f in ctf]),
            group_id=jnp.asarray(
                group_id[flat].astype(np.int32).reshape(2, L)),
        )

        ft_ori = self.data.ft_ori
        if isinstance(ft_ori, HostFt):
            from thunder_tpu.pipeline.preprocess import init_sigma_from_moments

            sigs = []
            for h in (0, 1):
                avg = jnp.zeros((cfg.size, cfg.size), jnp.complex64)
                p2 = jnp.zeros((cfg.size, cfg.size), jnp.float32)
                for lo in range(0, L, cfg.host_ft_chunk):
                    c = ft_ori.get(h, slice(lo, min(L, lo + cfg.host_ft_chunk)))
                    avg = avg + jnp.sum(c, axis=0)
                    p2 = p2 + jnp.sum(jnp.abs(c) ** 2, axis=0)
                sigs.append(init_sigma_from_moments(avg / L, p2 / L,
                                                    cfg.max_r))
            sigma = jnp.stack([
                jnp.broadcast_to(sg, (self.n_group, cfg.max_r))
                for sg in sigs
            ])
        else:
            sigma = jnp.stack([
                jnp.broadcast_to(init_sigma(ft_ori[h], cfg.max_r),
                                 (self.n_group, cfg.max_r))
                for h in (0, 1)
            ])

        if init_refs is None:
            refs = self._blank_refs()
        else:
            refs = np.asarray(init_refs, dtype=np.float32)
            if refs.ndim == (2 if cfg.mode_2d else 3):
                refs = np.repeat(refs[None], cfg.k, axis=0)
        refs2 = jnp.stack([jnp.asarray(refs)] * 2)

        self.key, sub = jax.random.split(self.key)
        n_d = cfg.m_l_d if cfg.c_search else 1
        if resume_thu is not None and not cfg.g_search:
            t = resume_thu
            par = pt.from_thu(
                t.quat[flat], t.trans[flat], t.std_trans[flat],
                np.stack([t.k1[flat], t.k2[flat], t.k3[flat]], axis=1),
                t.defocus_factor[flat], t.std_defocus_factor[flat],
                cfg.n_rot_local, cfg.m_l_t, n_d, sub, self.mode,
            )
            cls = jnp.asarray(
                np.clip(t.class_id[flat], 0, cfg.k - 1)
                .astype(np.int32).reshape(2, L)
            )
        else:
            par = pt.init_particles(sub, 2 * L, cfg.n_rot_local, cfg.m_l_t,
                                    n_d, cfg.trans_s, self.mode)
            self.key, sub = jax.random.split(self.key)
            cls = jax.random.randint(sub, (2, L), 0, cfg.k)
        par = jax.tree.map(lambda a: a.reshape((2, L) + a.shape[1:]), par)

        self.state = StackedState(refs=refs2, sigma=sigma, par=par, cls=cls)
        self.offset = jnp.zeros((2, L, 2), jnp.float32)
        self.valid_dev = jnp.asarray(self.valid.astype(np.float32))
        self.round_records: list[dict] = []
        self._ref_mask = None
        self._ref_mask_dev = None
        self._soft_mask_cache = None
        self._proj_stack_cache: dict = {}
        self._round_brick = None
        self._round_order = None        # per-image routing permutation
        self._round_segs = ()           # routed (count, rung) segments
        self._brick_used: set = set()   # configs engaged this process
        if cfg.perform_mask and cfg.mask_path:
            from thunder_tpu.io.mrc import read_mrc

            try:
                self._ref_mask, _ = read_mrc(cfg.mask_path)
            except FileNotFoundError:
                self._ref_mask = None

        if mesh is not None:
            self._apply_shardings()

    # ------------------------------------------------------------------

    def _plan_residency(self) -> dict:
        """Projected per-device HBM bytes for the run's resident state,
        and the knobs auto-enabled from that arithmetic (VERDICT r3
        #6).  The reference never asked the user: its original images
        always lived on host and streamed per stage (allocPreCal,
        Optimiser.cpp:7991-8171).  Here the masked stack is the compute
        working set (device), and the ORIGINAL stack — only read by
        rank-1 stages (sigma/norm/scale/recentre) — moves to host
        automatically when the two copies plus tables and grids exceed
        the per-chip budget.

        Counted (per device): both image-stack copies, the corner-row
        projection table at the full search radius, the fastest brick
        rung's table (capped by BRICK_TABLE_BUDGET), and the padded
        F/T reconstruction grids; plus a 25% headroom for the phase
        loop's transient tensors.  Returns the plan for logging."""
        cfg = self.cfg
        n_img, s = self.n_img, cfg.size
        hemi_sh = data_sh = 1
        if self.mesh is not None:
            ax = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
            hemi_sh = ax.get("hemi", 1)
            data_sh = ax.get("data", 1)
        stack = 2 * n_img * s * s * 8 / (hemi_sh * data_sh)
        crop = _proj_crop_size(s, cfg.pf, cfg.max_r)
        nd = 2 if cfg.mode_2d else 3
        oct_tab = crop ** nd * 16 * cfg.k * (2 // hemi_sh)
        brick_tab = 0
        if nd == 3:
            from thunder_tpu.ops.brick import table_bytes as _brick_bytes

            brick_tab = min(BRICK_TABLE_BUDGET,
                            _brick_bytes(4, 1, crop, cfg.k))
        grid = (s * cfg.pf) ** nd
        reco = grid * 12 * cfg.k * (2 // hemi_sh)       # F c64 + T f32
        if (self.mesh is not None and nd == 3
                and grid * 8 / 2 ** 20 >= cfg.vol_shard_min_mb):
            reco /= data_sh                              # z-slab sharded
        budget = cfg.hbm_gb or float(
            os.environ.get("THUNDER_HBM_GB", 0)) or self._device_hbm_gb()
        plan = {
            "per_device_gb": {
                "ft_masked": stack / 2 ** 30,
                "ft_ori": stack / 2 ** 30,
                "proj_table_oct": oct_tab / 2 ** 30,
                "proj_table_brick": brick_tab / 2 ** 30,
                "reco_grids": reco / 2 ** 30,
            },
            "headroom_factor": 1.25,
            "budget_gb": budget,
            "mesh": {"hemi": hemi_sh, "data": data_sh},
        }
        total = 1.25 * (2 * stack + oct_tab + brick_tab + reco)
        plan["total_gb"] = total / 2 ** 30
        if (cfg.auto_residency and not cfg.host_ft_ori
                and total > budget * 2 ** 30):
            cfg.host_ft_ori = True
            plan["auto"] = "host_ft_ori"
            total -= 1.25 * stack
            plan["total_gb"] = total / 2 ** 30
        if total > budget * 2 ** 30:
            plan["warning"] = (
                f"projected {total / 2 ** 30:.1f} GB/device exceeds the "
                f"{budget:.0f} GB budget even with host-resident "
                f"originals; widen the data mesh axis")
        if plan.get("auto") or plan.get("warning"):
            print(f"[residency] {plan}", flush=True)
        return plan

    @staticmethod
    def _device_hbm_gb() -> float:
        try:
            st = jax.devices()[0].memory_stats()
            if st and st.get("bytes_limit"):
                return st["bytes_limit"] / 2 ** 30
        except Exception:
            pass
        return 16.0

    def _ft_chunks(self):
        """L-chunk slices for ft_ori consumers: one full-range slice on
        the device-resident path, host_ft_chunk-sized pieces when the
        originals live in host memory."""
        if not isinstance(self.data.ft_ori, HostFt):
            return [slice(0, self.n_img)]
        step = self.cfg.host_ft_chunk
        return [slice(lo, min(self.n_img, lo + step))
                for lo in range(0, self.n_img, step)]

    def _ft_ori_chunk(self, sl: slice) -> jax.Array:
        ft = self.data.ft_ori
        if isinstance(ft, HostFt):
            return ft.chunk(sl)
        return ft[:, sl]

    def _host(self, a):
        """Fetch a (possibly image-sharded) device array — or a pytree
        of them — to the host.  Every call is one tunnel round-trip
        (~70-150 ms through the remote-dispatch backend), so per-round
        host logic batches its pulls into ONE tree-valued call.  Under
        multi-process execution a plain np.asarray of a
        non-fully-addressable array fails; process_allgather replaces
        the reference's master-rank gathers (MPI_Allreduce over stats,
        Optimiser.cpp:6605-6700)."""
        import jax as _jax

        if self.mesh is not None and _jax.process_count() > 1:
            from jax.experimental import multihost_utils

            out = multihost_utils.process_allgather(a, tiled=True)
            return _jax.tree.map(np.asarray, out)
        return _jax.device_get(a)

    def _apply_shardings(self):
        """Commit every device array to its mesh placement; subsequent
        jitted stages inherit the layout and the partitioner inserts
        the psum-over-data / hemi-split collectives."""
        put_i = lambda a, extra: jax.device_put(a, self._sh_img(extra))
        put_s = lambda a, extra: jax.device_put(a, self._sh_state(extra))
        d = self.data
        self.data = StackedData(
            ft_masked=put_i(d.ft_masked, 2),
            ft_ori=(d.ft_ori if isinstance(d.ft_ori, HostFt)
                    else put_i(d.ft_ori, 2)),
            ctf_params=CtfParams(*[put_i(f, 0) for f in d.ctf_params]),
            group_id=put_i(d.group_id, 0),
        )
        s = self.state
        s.refs = put_s(s.refs, s.refs.ndim - 1)
        s.sigma = put_s(s.sigma, 2)
        s.par = jax.tree.map(lambda a: put_i(a, a.ndim - 2), s.par)
        s.cls = put_i(s.cls, 0)
        self.offset = put_i(self.offset, 1)
        self.valid_dev = put_i(self.valid_dev, 0)

    def _blank_refs(self) -> np.ndarray:
        cfg = self.cfg
        from thunder_tpu.physics.mask import radial_grid

        nd = 2 if cfg.mode_2d else 3
        u = np.asarray(radial_grid(cfg.size, nd))
        r = cfg.mask_radius / cfg.pixel_size
        blob = np.where(u < r, 1.0, 0.0).astype(np.float32)
        refs = np.repeat(blob[None], cfg.k, axis=0)
        rng = np.random.default_rng(cfg.seed)
        refs = refs * (1 + 0.01 * rng.standard_normal(refs.shape).astype(np.float32))
        return refs

    def _rings(self) -> PackedRings:
        return pack_rings(self.cfg.size, int(self.model.r), self.cfg.r_low)

    def _pack_inputs(self, rings: PackedRings):
        cfg = self.cfg
        return _pack_inputs_h(
            self.data.ft_masked, self.data.ctf_params, self.state.sigma,
            self.data.group_id, rings.i_col, rings.i_row, rings.i_sig,
            rings.mask, cfg.size, float(cfg.pixel_size),
        )

    def _proj_stack(self, rings: PackedRings, refs=None, kind="round"):
        """Prepared projection tables for the current references.

        Building one (pf-padded FFT of every class + grid correction +
        corner-row packing) costs a large fraction of a round at big
        boxes, and several stages per round need the same table
        (refreshProj builds once per round in the reference,
        Model.cpp:1013) — so cache per (refs version, crop, kind).

        When the round runs in brick mode (self._round_brick set by
        run_round), the single table built here is the brick table and
        every projecting stage passes the same brick statics."""
        cfg = self.cfg
        # TWO corner-row tiers (round-4 regression fix: one shared
        # table at r_sig = rU put the PHASE loop's R~125 gathers onto a
        # crop(rU)^3 table far past the row-gather cache cliff —
        # measured 0.63 s -> 1.55 s/phase at 256px local rounds):
        #   * kind None  — corner-row at the ROUND's max gather radius
        #     (r_sig = rU): sigma, norm and the residual stages project
        #     ONE rotation per image across the r..rU band and share
        #     this table; any cached crop >= requested serves.
        #   * kind "oct" — corner-row at EXACTLY the requested band:
        #     the phase loop and global search issue L*R*P rows, and
        #     their gather rate is set by the table's working set, so
        #     they get their own crop(r) table (an extra ~0.1 s
        #     zoom-DFT build per round, repaid many times over).
        # BRICK tables build at the requesting PHASE band too: with the
        # reference band rU = r + maxR/3, a phase-band brick at
        # crop(rU) would be ~8x the bytes the gathers address.
        if kind == "round":
            kind = self._round_brick or "oct"
        exact = kind == "oct"
        family = "cr" if kind in (None, "oct") else kind
        if kind is None:
            r_tab = max(rings.r_u, getattr(self, "_round_r_sig", 0))
        else:
            r_tab = rings.r_u
        crop = _proj_crop_size(cfg.size, cfg.pf, r_tab)
        if refs is not None:
            return _prepare_projectee_stack_h(refs, cfg.size, cfg.pf,
                                              cfg.mode_2d, crop)
        ver = self.state.refs_version
        # a cached table of the SAME family serves if its crop covers
        # the requested radius — exact-crop only for the hot-loop tier
        # (a bigger table would silently reintroduce the cliff)
        for (c_have, k_have), (ver_have, stack) in                 self._proj_stack_cache.items():
            if (ver_have == ver and k_have == family
                    and (c_have == crop if exact else c_have >= crop)):
                return stack
        stack = _prepare_projectee_stack_h(
            self.state.refs, cfg.size, cfg.pf, cfg.mode_2d, crop,
            None if family == "cr" else family)
        self._proj_stack_cache = {
            c: v for c, v in self._proj_stack_cache.items() if v[0] == ver
        }
        self._proj_stack_cache[(crop, family)] = (ver, stack)
        return stack

    def _brick_statics(self, stack):
        """(span, stride, b) statics for _project_any, derived from the
        built table (b = nz * stride), or None in corner-row rounds."""
        if self._round_brick is None:
            return None
        span, stride = self._round_brick
        return (span, stride, stack.shape[2] * stride)

    def _brick_choice(self, r_u: int, mid_round: bool = False,
                      spread_q98: float | None = None):
        """Per-round projection-table mode: brick when every image's
        rotation support stays within the brick spread margin at the
        round's outermost ring (see ops/brick.py docstring), else the
        corner-row table.  Host-side, from the current particle state —
        the analogue of the reference GPU path choosing texture layouts
        once per iteration.  ``mid_round=True`` (chunked phase driver)
        also considers rounds whose search type is GLOBAL: the clouds
        tighten within the round as phases resample.  ``spread_q98``
        (radians) lets the caller reuse a deviation quantile it already
        fetched in a batched pull; otherwise one scalar is fetched."""
        from thunder_tpu.ops.brick import spread_margin

        cfg = self.cfg
        force = os.environ.get("THUNDER_BRICK", "")
        if force == "off":
            return None
        if force and not mid_round:
            span, stride = (int(v) for v in force.split(","))
            return (span, stride)
        if cfg.mode_2d or (self.model.search_type == SEARCH_TYPE_GLOBAL
                           and not mid_round):
            return None
        if spread_q98 is None:
            spread_q98 = float(self._host(_spread_q98_h(
                self.state.par.r, self.valid_dev)))
        if not np.isfinite(spread_q98):
            return None
        # the 98th percentile of SUPPORT-POINT deviations decides: the
        # few outlier support points beyond the margin degrade to
        # clamped interpolation (a closer pose's value), the same
        # fidelity class as the reference GPU path's 8-bit texture
        # interpolation weights.  1.3 covers the per-phase perturbation
        # kick (perturb_r draws at a fraction of the cloud scale) at
        # ROUND start; mid-round the measured chunk-boundary sequences
        # tighten monotonically (5.5 -> 3.5 -> 2.6 cells at 256px local
        # r=42) because the current support q98 already includes this
        # phase's perturbation, so a smaller 1.15 headroom suffices —
        # the flat 1.3 left those rounds on the corner-row table by a
        # few percent of margin.
        kick = 1.15 if mid_round else 1.3
        spread_cells = spread_q98 * kick * cfg.pf * max(r_u, 1)
        if os.environ.get("THUNDER_DEBUG_SPREAD"):
            print(f"    [brick] spread={spread_cells:.2f} cells "
                  f"r_u={r_u} mid={mid_round}", flush=True)
        # hysteresis + stickiness: ENTERING an uncompiled brick config
        # costs a fresh phase-loop compile, so it needs 20% margin
        # headroom; a config this process has already used (compiled,
        # in the persistent cache) re-engages at its plain margin.
        # Prevents the enter/leave flip-flop seen at 256px, where every
        # flip re-paid a compile.
        prev = self._round_brick
        # ladder, fastest first with monotone margins (measured at
        # 256px r=28, L=128, scripts/micro_brick.py: corner-row 124 ms,
        # (4,1) 16.4, (5,2) 24.9, (6,2) 34.4, (7,3) 47.9 ms/phase-
        # gather).  Stride-1 and even-span rungs trade HBM for gather
        # rows (one brick per cell / tighter windows), so each rung is
        # admitted only if its table fits the byte budget; the (9,4)
        # rung is gone — it only ever engaged transiently before
        # tightening, and at 12 s compile per program variant through
        # the remote backend it cost more than it saved.
        from thunder_tpu.ops.brick import table_bytes

        crop = _proj_crop_size(cfg.size, cfg.pf, r_u)
        # the wide-margin (8,2) rung (margin 2.5 cells) exists for the
        # round-START spread of converged local rounds, which breathes
        # with the perturbation floor (measured 0.3-3 cells at 256px);
        # without it those rounds run entirely on the corner-row table
        # (~470 ms/phase at r=42 vs ~60 ms engaged).  It is admitted
        # only where the corner-row gather is SLOW (oct table past the
        # cache cliff): measured at 128px r=14 (3.5 MB oct table) a
        # brick(8,2) round is ~5-15% slower than oct-half, while at
        # 256px r>=35 corner-row pays ~3-5 ns/row.  Spans beyond 8 are
        # excluded outright: building a span^3>=1000 table OOMs (XLA
        # materialises the s^3 strided-slice copies with pathological
        # (2,128)-tile padding at small minor dims — measured 128x
        # expansion per slice at 128px local shapes).
        oct_bytes = crop ** 3 * 16 * cfg.k
        for span, stride in ((4, 1), (5, 2), (6, 2), (7, 3), (8, 2)):
            if span >= 8 and oct_bytes < 48e6:
                continue
            if table_bytes(span, stride, crop, cfg.k) > BRICK_TABLE_BUDGET:
                continue
            margin = spread_margin(span, stride)
            known = (prev == (span, stride)
                     or (span, stride) in self._brick_used)
            # unknown-config headroom: 20% for the cheap narrow rungs
            # (entering transiently costs a fresh compile), but only 5%
            # for the wide (8,2) rung — it exists for breathing local
            # rounds whose mid-round spread sits a few percent under
            # its margin (measured 2.0-2.3 cells raw vs margin 2.5 at
            # 256px r=42), the alternative is ~470 ms/phase corner-row,
            # and the persistent compile cache makes its one-time
            # compile a per-machine, not per-run, cost.
            pen = 0.95 if span >= 8 else 0.8
            if spread_cells <= (margin if known else pen * margin):
                return (span, stride)
        return None

    def _route_bounds(self) -> tuple:
        """Fixed per-hemisphere segment boundaries for per-image table
        routing: (L/2, 3L/4, 7L/8, L).  The measured per-image spread
        distribution at 256px local rounds is BIMODAL with a
        fluctuating tail — the majority of clouds sit under 1 cell
        while 2-50%% of images carry 4-300-cell rejuvenated clouds
        (THUNDER_DEBUG_SPREAD probe, round 4) — so halving segments
        let the tight half ride the fastest rung while only the true
        tail pays the corner-row gather (measured 0.9-1.4 s/loop for a
        half-batch outlier tier vs ~0.27 s for an eighth).  Fixed
        boundaries keep the per-segment program shapes stable across
        rounds.  Empty disables routing (tiny batches,
        THUNDER_SPLIT=0)."""
        if os.environ.get("THUNDER_SPLIT", "1") == "0":
            return ()
        n_img = int(self.state.par.r.shape[1])
        if n_img < 32:
            return ()
        bounds = sorted({n_img // 2, 3 * n_img // 4,
                         7 * n_img // 8, n_img})
        return tuple(b for b in bounds if b > 0)

    def _table_plan(self, r_u: int, mid_round: bool = False,
                    spread_img=None):
        """Projection-table plan -> (rung, order, segs):

        * (rung, None, ()) — EVERY valid image's cloud fits ``rung``:
          whole-batch brick (round 3's behavior, but keyed on the max
          per-image q98 instead of the pooled q98, a stronger
          guarantee); rung None = corner-row for everyone.
        * (rung, order, segs) — per-image SEGMENTED ROUTING (VERDICT
          r3 #1): ``order`` is the (2, L) image permutation by
          ascending spread; ``segs`` is a tuple of (count, rung) runs
          covering all L images tightest-first, each segment on the
          FASTEST rung whose margin covers every cloud in it (rung
          None = corner-row).  Fixed boundaries at L/2, 3L/4, 7L/8
          (merged when adjacent segments pick the same table) keep
          program shapes stable while the tight majority rides the
          fast rungs and only the true rejuvenated tail pays the
          corner-row gather — the whole-round fallback this replaces
          cost 256px LOCAL rounds ~40% of their throughput.

        ``spread_img`` lets the chunked phase driver reuse the (2, L)
        per-image quantile it already fetched at the boundary."""
        force = os.environ.get("THUNDER_BRICK", "")
        if force or self.cfg.mode_2d or (
                self.model.search_type == SEARCH_TYPE_GLOBAL
                and not mid_round):
            return (self._brick_choice(r_u, mid_round), None, ())
        if spread_img is None:
            spread_img = np.asarray(self._host(_spread_per_image_h(
                self.state.par.r, self.valid_dev)))
        sp = np.sort(np.nan_to_num(np.asarray(spread_img)), axis=1)
        if os.environ.get("THUNDER_DEBUG_SPREAD"):
            cells = sp * self.cfg.pf * max(r_u, 1)
            qs = np.quantile(cells, [0.5, 0.9, 0.98, 1.0], axis=1)
            print(f"    [plan] per-image spread cells q50/90/98/max = "
                  f"{np.round(qs.T, 2).tolist()} mid={mid_round}",
                  flush=True)
        bounds = self._route_bounds()
        # routing pays only where the corner-row gather is the slow
        # path (big tables, same criterion as mid-round chunking);
        # THUNDER_SPLIT=force drops the byte gate (tests, small boxes)
        crop = _proj_crop_size(self.cfg.size, self.cfg.pf, r_u)
        forced = os.environ.get("THUNDER_SPLIT") == "force"
        if not bounds or (crop ** 3 * 16 <= 24e6 and not forced):
            full = float(sp[:, -1].max())
            return (self._brick_choice(r_u, mid_round, spread_q98=full),
                    None, ())
        segs = []
        prev = 0
        for b in bounds:
            seg_max = float(sp[:, b - 1].max())
            rung = self._brick_choice(r_u, mid_round, spread_q98=seg_max)
            segs.append([b - prev, rung])
            prev = b
        # BUDDY merge only (equal rung AND equal count, from the tail):
        # greedy adjacent merging produced counts like 96/112 whose
        # phase programs each cost a fresh ~12-22 s compile; buddy
        # merging keeps every segment count in {L/8, L/4, L/2, L}, so
        # the program set is bounded and migration between plans at
        # chunk boundaries (run_round's driver) never needs a new
        # shape.  The extra dispatches of an unmerged same-rung prefix
        # are enqueued asynchronously — near-free next to one compile.
        while (len(segs) > 1 and segs[-1][1] == segs[-2][1]
               and segs[-1][0] == segs[-2][0]):
            segs[-2][0] += segs.pop()[0]
        if len(segs) == 1:
            return (segs[0][1], None, ())      # uniform: no split
        order = np.argsort(np.nan_to_num(np.asarray(spread_img)),
                           axis=1).astype(np.int32)
        return (segs[0][1], order, tuple((n, r) for n, r in segs))

    # -- global search --------------------------------------------------

    def _n_trans_global(self) -> int:
        cfg = self.cfg
        chi2q = 1.3862943611198906  # chisq Qinv(0.5, 2) = 2 ln 2
        n = int(round(math.pi * (cfg.trans_s * chi2q) ** 2
                      * cfg.trans_search_factor))
        return max(MIN_N_TRANSLATION_GLOBAL, n)

    def expectation_global(self, rings: PackedRings):
        cfg = self.cfg

        if cfg.mode_2d:
            n_rot = cfg.n_rot_global
        else:
            n_rot = max(1, cfg.n_rot_global // (1 + self.sym.n_elements))
        # round up to a whole number of MXU blocks (the grid is random
        # sampling, so extra rotations are just extra samples)
        if n_rot > _ROT_BLOCK:
            n_rot = _round_up(n_rot, _ROT_BLOCK)
        n_trans = self._n_trans_global()

        # each hemisphere draws its own pose grid (leading axis 2)
        self.key, kr, kt = jax.random.split(self.key, 3)
        if cfg.mode_2d:
            phi = jax.random.uniform(kr, (2, n_rot), maxval=2 * jnp.pi)
            quats = jnp.stack(
                [jnp.cos(phi), jnp.sin(phi), jnp.zeros_like(phi),
                 jnp.zeros_like(phi)], axis=-1)
            rot = rotate2d_from_unit(quats[..., :2])
        else:
            quats = random_quat(kr, (2, n_rot))
            rot = rotate3d(quats)
        trans = jax.random.normal(kt, (2, n_trans, 2)) * cfg.trans_s

        dat_w, sctf2, a_term = self._pack_inputs(rings)
        tra = translate_phases(rings, trans)
        proj_stack = self._proj_stack(rings)

        block = min(_ROT_BLOCK, n_rot)
        n_blocks = (n_rot + block - 1) // block
        d_rot = 2 if cfg.mode_2d else 3
        rot_blocks = rot.reshape(2, n_blocks, block, d_rot, d_rot)
        w_c, w_r, w_t = _global_search_h(
            proj_stack, rot_blocks, rings.i_col, rings.i_row,
            dat_w, sctf2, a_term, tra, cfg.size, cfg.pf, cfg.mode_2d,
            seq=self.mesh is None,
        )
        return dict(w_c=w_c, w_r=w_r, w_t=w_t, quats=quats, trans=trans)

    def adopt_global(self, g: dict):
        cfg = self.cfg
        s = self.state
        self.key, sub = jax.random.split(self.key)
        keys = jax.random.split(sub, 2)
        par, cls = _adopt_global_h(
            keys, g["w_c"], g["w_r"], g["w_t"], g["quats"], g["trans"],
            s.par.d, s.par.w_d, s.par.u_d,
            cfg.n_rot_local, cfg.m_l_t, self.mode,
        )
        s.par = par
        s.cls = cls

    # -- local phases ---------------------------------------------------

    def local_phases(self, rings: PackedRings) -> jax.Array:
        cfg = self.cfg
        s = self.state

        is_global = self.model.search_type == SEARCH_TYPE_GLOBAL
        is_ctf = self.model.search_type == SEARCH_TYPE_CTF and cfg.c_search
        min_phase = (MIN_N_PHASE_PER_ITER_GLOBAL if is_global
                     else MIN_N_PHASE_PER_ITER_LOCAL)
        pf_small = (cfg.perturb_factor_s_global if is_global
                    else (cfg.perturb_factor_s_ctf if is_ctf
                          else cfg.perturb_factor_s_local))
        if is_ctf:
            # EVERY CTF round re-initialises the defocus support around
            # 1 at std ctfRefineS (Particle::initD in the phase-0
            # branch, Optimiser.cpp:1195-1196) — the reference's
            # defocus exploration mechanism (see pt.init_d_round)
            self.key, kd0 = jax.random.split(self.key)
            s.par = _init_d_round_h(kd0, s.par, float(cfg.ctf_refine_s))

        def run_batch(par, cls, max_phase, loop_state, proj_stack, brick,
                      data_pack):
            self.key, sub = jax.random.split(self.key)
            keys = jax.random.split(sub, 2)
            mn = jnp.asarray(min_phase, jnp.int32)
            mx = jnp.asarray(max_phase, jnp.int32)
            if is_ctf:
                ft, gi, cb = data_pack
                return _phase_loop_ctf_h(
                    keys, par, cls, proj_stack, rings.i_col,
                    rings.i_row, rings.i_sig, rings.mask,
                    ft, s.sigma, gi, cb, mn, mx, loop_state,
                    cfg.size, cfg.pf, self.mode, float(pf_small),
                    float(cfg.trans_s), float(cfg.pixel_size),
                    seq=self.mesh is None, brick=brick,
                )
            dat_w, sctf2, a_term = data_pack
            return _phase_loop_h(
                keys, par, cls, proj_stack, rings.i_col, rings.i_row,
                dat_w, sctf2, a_term, mn, mx, loop_state,
                cfg.size, cfg.pf, self.mode,
                float(pf_small), float(cfg.trans_s),
                seq=self.mesh is None, brick=brick,
            )

        def full_data_pack():
            if is_ctf:
                return (self.data.ft_masked, self.data.group_id,
                        self.data.ctf_params)
            return self._pack_inputs(rings)

        def run_chunk(par, max_phase, loop_state):
            proj_stack = self._proj_stack(rings)
            return run_batch(par, s.cls, max_phase, loop_state,
                             proj_stack, self._brick_statics(proj_stack),
                             full_data_pack())

        def run_routed(par, loop_state, order, segs, max_phase):
            """Per-image SEGMENTED table routing (VERDICT r3 #1): each
            spread-sorted segment runs the fastest rung whose margin
            covers it (None = corner-row), one fixed-shape adaptive
            loop per segment, instead of a whole-round fallback when a
            few clouds rejuvenate.  Per-image independence makes the
            split exact (the reference's loop IS per-image,
            Optimiser.cpp:1183); only the variance-stall means run
            over each segment separately.  ``max_phase`` bounds every
            segment so the driver can re-sort at a chunk boundary
            (MIGRATION: a wide cloud that tightens leaves the
            corner-row tail for a brick rung)."""
            idx = jnp.asarray(order)
            inv = jnp.asarray(np.argsort(order, axis=1).astype(np.int32))
            data = full_data_pack()
            outs = []
            dbg_route = os.environ.get("THUNDER_DEBUG_ROUTE")
            pos = 0
            for n_seg, rung in segs:
                sub_idx = idx[:, pos:pos + n_seg]
                pos += n_seg
                stack = self._proj_stack(rings, kind=rung or "oct")
                brick = (None if rung is None
                         else (rung[0], rung[1],
                               stack.shape[2] * rung[1]))
                t_b = time.time()
                outs.append(run_batch(
                    _take_l(par, sub_idx), _take_l(s.cls, sub_idx),
                    max_phase, loop_state, stack, brick,
                    _take_l(data, sub_idx)))
                if dbg_route:
                    ph = self._host(outs[-1][1])
                    print(f"    [route] {rung or 'oct'} n={n_seg} "
                          f"ph={list(ph)} "
                          f"{(time.time() - t_b) * 1e3:.0f} ms",
                          flush=True)
            merged = outs[0][0]
            phase, n_no_dec, prev = outs[0][1], outs[0][2], outs[0][3]
            for po, ph_o, nd_o, pv_o in outs[1:]:
                merged = jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b], axis=1),
                    merged, po)
                phase = jnp.maximum(phase, ph_o)
                n_no_dec = jnp.minimum(n_no_dec, nd_o)
                # stall baseline: per-component MAX across segments —
                # seeding a wide segment's next chunk with a tight
                # segment's tiny variances would fake a stall and cut
                # its phases short
                prev = jnp.maximum(prev, pv_o)
            return _take_l(merged, inv), phase, n_no_dec, prev

        # chunked driving with mid-round brick engagement: the clouds
        # tighten as phases resample (esp. after global adoption), so a
        # round that started on the corner-row table can switch to the
        # brick table at a chunk boundary once the spread fits.  The
        # stall state (phase, n_no_dec, prev vari) carries across
        # chunks, so the stopping rule is identical to the monolithic
        # loop; min/max phase are traced, so every chunk reuses one
        # compilation per table kind.
        # Local/CTF rounds run only MIN_N_PHASE_PER_ITER_LOCAL(3)-6
        # phases (carried tight clouds stall the variance rule almost
        # immediately), so a chunk-4 boundary usually lands after the
        # loop is already done and the whole round runs corner-row even
        # though the cloud re-tightens within 1-2 phases of the round's
        # first resample (the round-START spread breathes with the
        # perturbation floor, measured 0.3-3 cells round-over-round at
        # 256px).  A 2-phase first boundary costs one tunnel round-trip
        # (~150 ms) and saves 1-4 corner-row phases (~470 ms each at
        # r=42).  Global rounds keep chunk 4: their adopted clouds need
        # ~4 phases to collapse below any brick margin.
        default_chunk = 4 if self.model.search_type == SEARCH_TYPE_GLOBAL else 2
        chunk = int(os.environ.get("THUNDER_PHASE_CHUNK", default_chunk))
        # chunking pays only where the corner-row gather dominates the
        # phase cost — big tables (the measured brick-vs-oct crossover;
        # at 128px warm brick ~ oct-half, so chunk syncs would be pure
        # overhead there)
        table_bytes = _proj_crop_size(cfg.size, cfg.pf, rings.r_u) ** 3 * 16
        chunking = chunk > 0 and not cfg.mode_2d and table_bytes > 24e6
        fmax = float(np.finfo(np.float32).max)
        loop_state = (jnp.zeros((2,), jnp.int32),
                      jnp.zeros((2,), jnp.int32),
                      jnp.full((2, 4), fmax, jnp.float32))
        par = s.par
        phases_done = 0
        n_boundary = 0
        dbg = os.environ.get("THUNDER_DEBUG_CHUNK")
        while True:
            t_c = time.time()
            routed = self._round_order is not None
            # a chunk boundary costs one tunnel round-trip; it buys
            # either a FIRST engagement (corner-row round whose clouds
            # may tighten onto a rung) or a MIGRATION (routed round
            # with a corner-row tail whose clouds tighten onto a
            # rung).  A uniformly-engaged brick round has nothing left
            # to gain — run it as one adaptive dispatch.
            boundary = chunking and (
                (self._round_brick is None and not routed)
                or (routed and any(r is None
                                   for _, r in self._round_segs)))
            # EXPONENTIAL boundary spacing (2, 4, 8, ... phases): the
            # migration opportunities are front-loaded — clouds tighten
            # within 1-2 phases of the first resamples — while a round
            # that keeps its corner-row tail (the persistent-outlier
            # case, measured 28-phase 256px local rounds) pays the
            # ~150 ms round-trip + segment re-dispatch at EVERY fixed
            # boundary for nothing: 14 boundaries -> 4.
            nxt = (min(phases_done + chunk * 2 ** n_boundary,
                       MAX_N_PHASE_PER_ITER)
                   if boundary else MAX_N_PHASE_PER_ITER)
            if routed:
                par, phase, n_no_dec, prev = run_routed(
                    par, loop_state, self._round_order,
                    self._round_segs, nxt)
            else:
                par, phase, n_no_dec, prev = run_chunk(par, nxt,
                                                       loop_state)
            if nxt >= MAX_N_PHASE_PER_ITER:
                break
            # ONE tunnel round-trip per boundary: stall state + the
            # per-image spread quantiles the table plan keys on
            ph, nnd, spread_img = self._host(
                (phase, n_no_dec,
                 _spread_per_image_h(par.r, self.valid_dev)))
            if dbg:
                tag = ("route%s" % (self._round_segs,) if routed
                       else (self._round_brick or "oct"))
                print(f"    [chunk] ->{nxt} table={tag} ph={list(ph)} "
                      f"{(time.time() - t_c) * 1e3:.0f} ms", flush=True)
            done = (ph >= MAX_N_PHASE_PER_ITER) | (
                (ph >= min_phase)
                & (nnd >= N_PHASE_WITH_NO_VARI_DECREASE))
            if done.all():
                break
            n_boundary += 1
            phases_done = int(ph.max())
            loop_state = (phase, n_no_dec, prev)
            s.par = par
            # adopt the boundary's plan wholesale: fixed buddy-shape
            # segments mean a migrated plan reuses compiled programs
            rung, order, segs = self._table_plan(
                rings.r_u, mid_round=True,
                spread_img=np.asarray(spread_img))
            self._round_brick = rung
            self._round_order = order
            self._round_segs = segs
            if rung is not None:
                self._brick_used.add(rung)

        par = _finish_phases_h(par, self.sym.quats, self.mode,
                               self.sym.order > 1 and not cfg.mode_2d)
        s.par = par
        # returned undrained: run_round fetches it in the batched
        # per-round stats pull (one round-trip for phases + monitoring)
        return phase

    # -- maximization ---------------------------------------------------

    def refresh_sigma(self):
        cfg = self.cfg
        s = self.state
        # the references carry signal up to the PREVIOUS round's
        # reconstruction radius r_u = r+3 (capped at max_r, see
        # reconstruct_round): project shells below that radius and feed
        # plain data power above — the reference's whole-frequency sigma
        # (OPTIMISER_SIGMA_WHOLE_FREQUENCY, Optimiser.cpp:6397) also
        # reduces to data power wherever the reference is empty.
        # Projecting to r (not r+3) counted real signal in the r..r+3
        # band as noise — exactly the shells that activate when the
        # search radius grows next round.
        r_lo = int(self.model.r_u)
        # lane=512: these R=1 stages are matmul/reduction-bound, and
        # coarse lane buckets keep their ring shapes stable across the
        # per-round radii (r+3, r_norm, r_s) — each new shape recompiles
        # the stage program (~minutes over the tunnel)
        rings = pack_rings(cfg.size, r_lo, 0, lane=512)
        rings_hi = pack_rings(cfg.size, cfg.max_r, r_lo, lane=512)
        proj_stack = self._proj_stack(rings, kind=None)
        top_t = s.par.top_t - self.offset
        acc = None
        for sl in self._ft_chunks():
            sig_c, cnt_c = _sigma_step_h(
                self._ft_ori_chunk(sl), _slice_l(self.data.ctf_params, sl),
                rings.mask, rings.i_col, rings.i_row, rings.i_sig,
                rings_hi.i_col, rings_hi.i_row, rings_hi.i_sig,
                rings_hi.mask, proj_stack, s.cls[:, sl],
                s.par.top_r[:, sl], top_t[:, sl],
                self.data.group_id[:, sl], self.valid_dev[:, sl],
                cfg.size, cfg.pf, cfg.mode_2d, cfg.max_r, self.n_group,
                float(cfg.pixel_size),
                brick=None,
            )
            acc = ((sig_c, cnt_c) if acc is None
                   else (acc[0] + sig_c, acc[1] + cnt_c))
        # all shells refresh (below r_lo: projected residual; above:
        # plain data power) — the original one-shot semantics
        s.sigma = _sigma_final(acc[0], acc[1], s.sigma,
                               jnp.asarray(cfg.max_r), cfg.max_r)

    def maximization_stats(self, i_round: int):
        """Fused normCorrection + allReduceSigma + scale correction
        (maximization, Optimiser.cpp:3405-3559) as one device program —
        one rank-1 projection pass, zero host pulls (see _max_stats_h).
        Device-resident stacks only; host-streamed originals keep the
        sequential two-pass path (the norm median must be global before
        sigma's accumulation can close over it chunk-by-chunk)."""
        cfg = self.cfg
        s = self.state
        is_global = self.model.search_type == SEARCH_TYPE_GLOBAL
        do_norm = i_round != 0 and not is_global
        do_scale = is_global and cfg.group_scl and i_round != 0

        r_lo = int(self.model.r_u)
        rings = pack_rings(cfg.size, r_lo, 0, lane=512)
        rings_hi = pack_rings(cfg.size, cfg.max_r, r_lo, lane=512)
        proj_stack = self._proj_stack(rings, kind=None)
        top_t = s.par.top_t - self.offset

        r_norm = min(int(self.model.r), self.model.resolution_p(0.75))
        r_norm = max(r_norm, cfg.r_low + 2)
        r_s = max(2, min(int(self.model.r),
                         cfg.res_a2p(cfg.sclCor_res)))

        sigma_new, s_norm, scale_g = _max_stats_h(
            self._ft_ori_chunk(slice(0, self.n_img)),
            self.data.ctf_params,
            rings.mask, rings.i_col, rings.i_row, rings.i_sig,
            rings_hi.i_col, rings_hi.i_row, rings_hi.i_sig,
            rings_hi.mask, proj_stack, s.cls, s.par.top_r, top_t,
            self.data.group_id, self.valid_dev, s.sigma,
            jnp.asarray(cfg.r_low, jnp.int32),
            jnp.asarray(r_norm, jnp.int32),
            jnp.asarray(r_s, jnp.int32),
            cfg.size, cfg.pf, cfg.mode_2d, cfg.max_r, self.n_group,
            float(cfg.pixel_size), do_norm, bool(cfg.group_scl),
            brick=None,
        )
        s.sigma = sigma_new
        d = self.data
        if do_norm:
            self.data = d._replace(
                ft_masked=d.ft_masked * s_norm[..., None, None],
                ft_ori=d.ft_ori * s_norm[..., None, None],
            )
        elif do_scale:
            per_img = jnp.take_along_axis(scale_g, d.group_id, axis=1)
            self.data = d._replace(
                ft_masked=d.ft_masked / per_img[..., None, None],
                ft_ori=d.ft_ori / per_img[..., None, None],
            )
            s.sigma = s.sigma / (scale_g[..., None] ** 2)

    def solvent_flatten(self, apply_mask: bool):
        """Mask the references (solventFlatten, Optimiser.cpp:7768-7989;
        default flags reduce it to reference masking with zero
        background, OPTIMISER_SOLVENT_FLATTEN_MASK_ZERO)."""
        cfg = self.cfg
        if apply_mask and self._ref_mask is not None:
            if self._ref_mask_dev is None:
                self._ref_mask_dev = jnp.asarray(self._ref_mask)
            w = self._ref_mask_dev
        else:
            w = self._soft_mask_dev()
        self.state.refs = _apply_mask_jit(self.state.refs, w)

    def _soft_mask_dev(self):
        """Device-cached soft spherical mask (built once, not per round
        — the host numpy rebuild + 8 MB upload was a measured 0.3 s/round
        at 128px)."""
        if self._soft_mask_cache is None:
            from thunder_tpu.constants import EDGE_WIDTH_RL
            from thunder_tpu.physics.mask import soft_mask_weight

            cfg = self.cfg
            nd = 2 if cfg.mode_2d else 3
            self._soft_mask_cache = jnp.asarray(soft_mask_weight(
                cfg.size, nd, cfg.mask_radius / cfg.pixel_size,
                EDGE_WIDTH_RL))
        return self._soft_mask_cache

    def _refresh_masked(self):
        """Rebuild the soft-masked spectra from offset-translated
        originals (reMaskImg, Optimiser.cpp:6093-6149)."""
        cfg = self.cfg
        chunks = [
            _remask_h(self._ft_ori_chunk(sl), self.offset[:, sl], cfg.size,
                      float(cfg.mask_radius / cfg.pixel_size))
            for sl in self._ft_chunks()
        ]
        self.data = self.data._replace(
            ft_masked=(chunks[0] if len(chunks) == 1
                       else jnp.concatenate(chunks, axis=1))
        )

    def re_centre_img(self):
        """Accumulate the rank-1 translation into the per-image offset
        and shift the particle cloud back (reCentreImg,
        Optimiser.cpp:6065-6090).  Images themselves are not rewritten;
        the offset enters the alignment as (t - offset) wherever the
        original images are used."""
        s = self.state
        tran = s.par.top_t                            # (2, L, 2)
        self.offset = self.offset - tran
        s.par = s.par._replace(
            t=s.par.t - tran[:, :, None, :],
            top_t=s.par.top_t - tran,
        )

    def _resid_stats(self, rings: PackedRings):
        cfg = self.cfg
        s = self.state
        proj_stack = self._proj_stack(rings, kind=None)
        top_t = s.par.top_t - self.offset
        outs = []
        for sl in self._ft_chunks():
            outs.append(_resid_stats_h(
                self._ft_ori_chunk(sl), _slice_l(self.data.ctf_params, sl),
                proj_stack, s.cls[:, sl], s.par.top_r[:, sl],
                top_t[:, sl], rings.i_col, rings.i_row, rings.mask,
                cfg.size, cfg.pf, cfg.mode_2d, float(cfg.pixel_size),
                brick=None,
            ))
        if len(outs) == 1:
            return outs[0]
        return tuple(jnp.concatenate([o[i] for o in outs], axis=1)
                     for i in range(3))

    def norm_correction(self):
        """Scale images so residual noise power is uniform
        (normCorrection, Optimiser.cpp:6201-6394): norm_l = ring-limited
        |ori - ctf proj(rank1)|^2, images *= sqrt(median/norm_l)."""
        cfg = self.cfg
        r_norm = min(int(self.model.r), self.model.resolution_p(0.75))
        r_norm = max(r_norm, cfg.r_low + 2)
        rings = pack_rings(cfg.size, r_norm, cfg.r_low, lane=512)
        norms, _, _ = self._resid_stats(rings)        # (2, L)
        # device-side masked median (nanmedian == np.median over the
        # valid subset, both interpolate the even-count midpoint) —
        # the scale never needs a host round-trip
        med = jnp.nanmedian(jnp.where(self.valid_dev > 0, norms, jnp.nan))
        scale = jnp.sqrt(med / jnp.maximum(norms, 1e-30))
        d = self.data
        if isinstance(d.ft_ori, HostFt):
            d.ft_ori.scale *= np.asarray(scale)
            self.data = d._replace(
                ft_masked=d.ft_masked * scale[..., None, None])
        else:
            self.data = d._replace(
                ft_masked=d.ft_masked * scale[..., None, None],
                ft_ori=d.ft_ori * scale[..., None, None],
            )

    def balance_classes(self, distr: np.ndarray | None = None):
        """Reassign starved classes' references from well-populated ones
        (refreshClassDistr + balanceClass, Optimiser.cpp:5484-5592;
        threshold CLASS_BALANCE_FACTOR/k of the particles).  ``distr``
        lets run_round hand in the class distribution it already
        drained in the batched per-round pull."""
        cfg = self.cfg
        if cfg.k <= 1:
            return []
        if distr is None:
            distr = self._host(_class_distr_h(
                self.state.cls, self.valid_dev, cfg.k))
        distr = np.asarray(distr)
        thres = 0.05 / cfg.k  # CLASS_BALANCE_FACTOR (Optimiser.h:71)
        heavy = int(np.argmax(distr))
        reborn = []
        for t in range(cfg.k):
            if distr[t] < thres:
                self.state.refs = self.state.refs.at[:, t].set(
                    self.state.refs[:, heavy]
                )
                reborn.append(t)
        return reborn

    def refresh_scale(self, r_s: int | None = None,
                      group: bool | None = None) -> jax.Array:
        """Per-group intensity scale = sum Re(dat conj(ctf pri)) /
        sum ctf^2 |pri|^2 over shells < r_s at the rank-1 pose
        (refreshScale, Optimiser.cpp:5749-6063 + scaleDataVSPrior).
        Returns (2, n_group)."""
        cfg = self.cfg
        if group is None:
            group = cfg.group_scl
        if r_s is None:
            r_s = max(2, min(int(self.model.r),
                             cfg.res_a2p(cfg.sclCor_res)))
        rings = pack_rings(cfg.size, r_s, 0, lane=512)
        _, xa, aa = self._resid_stats(rings)          # (2, L)
        xa = xa * self.valid_dev
        aa = aa * self.valid_dev
        if group:
            g_id = self.data.group_id
            n_group = self.n_group
            xa_g = jax.vmap(lambda x, g: jnp.zeros(n_group).at[g].add(x))(xa, g_id)
            aa_g = jax.vmap(lambda x, g: jnp.zeros(n_group).at[g].add(x))(aa, g_id)
            return xa_g / jnp.maximum(aa_g, 1e-30)
        tot = jnp.sum(xa, axis=1) / jnp.maximum(jnp.sum(aa, axis=1), 1e-30)
        return jnp.broadcast_to(tot[:, None], (2, self.n_group))

    def correct_scale(self, init: bool = False):
        """Apply the refreshed scale: scale the references (init) or
        divide the images + sigma (correctScale, Optimiser.cpp:5103-5143)."""
        scale = self.refresh_scale()                  # (2, n_group)
        s = self.state
        if init:
            s0 = scale[:, 0].reshape((2,) + (1,) * (s.refs.ndim - 1))
            s.refs = s.refs * s0
        else:
            per_img = jnp.take_along_axis(scale, self.data.group_id, axis=1)
            d = self.data
            if isinstance(d.ft_ori, HostFt):
                d.ft_ori.scale /= np.asarray(per_img)
                self.data = d._replace(
                    ft_masked=d.ft_masked / per_img[..., None, None])
            else:
                self.data = d._replace(
                    ft_masked=d.ft_masked / per_img[..., None, None],
                    ft_ori=d.ft_ori / per_img[..., None, None],
                )
            s.sigma = s.sigma / (scale[..., None] ** 2)

    def _reco_grid_size(self, r_u: int) -> int:
        """Cropped reconstructor box (Model::resetReco, Model.cpp:1113):
        min(size, (rU + ceil(a)) * 2), kept even and >= 16."""
        cfg = self.cfg
        size_r = min(cfg.size, 2 * (r_u + 2))
        size_r = max(16, size_r + (size_r % 2))
        return size_r

    def reconstruct_round(self):
        """Draw poses + insert both hemispheres' images into per-class
        (F, T) grids — one device program (reconstructRef,
        Optimiser.cpp:6711-7233).  Returns (f (2,K,...), t (2,K,...),
        r_u, grid_size)."""
        cfg = self.cfg
        s = self.state
        r_u = int(self.model.r_u)
        grid_size = self._reco_grid_size(r_u)
        rings = pack_rings(cfg.size, r_u, 0)
        # every projecting stage of this round is done — free the
        # projection tables (up to ~0.7 GB at 256px rU-band) before the
        # inserter's big transient grids; the references change after
        # reconstruction anyway, so the cache would be stale next use
        self._proj_stack_cache.clear()

        self.key, kd = jax.random.split(self.key)
        keys = jax.random.split(kd, 2)
        n_draw = min(cfg.m_reco, s.par.r.shape[2] * s.par.t.shape[2])
        # compact the draws: value-identical draws merge into one
        # weighted slice (exact — see pt.draw_poses_compact); the
        # sweep inserter's cost is proportional to the slice count
        n_slots = min(n_draw, RECO_COMPACT_SLOTS)
        if os.environ.get("THUNDER_RECO_COMPACT", "") == "off":
            n_slots = n_draw
        if n_slots < n_draw:
            quats, trans, d_draw, w_draw = _draw_poses_compact_h(
                keys, s.par, n_draw, n_slots)       # w_draw (2, L, S)
        else:
            quats, trans, d_draw = _draw_poses_h(keys, s.par, n_draw)
            w_draw = None
        # alignment against the ORIGINAL images: t - offset (the cloud
        # tracks re-centred images; insertion reads ft_ori)
        trans = trans - self.offset[:, :, None, :]

        use_d = bool(cfg.c_search
                     and self.model.search_type == SEARCH_TYPE_CTF)

        if cfg.par_gra and cfg.k == 1:
            # grading weights insertions by the rotation-compression
            # score; the reference applies it only in refinement
            # (parGra && k == 1, Optimiser.cpp:6726-6761 — with a
            # warning for classification, where it stays off)
            smax = jnp.max(s.par.score * self.valid_dev)
            w_img = s.par.score / jnp.maximum(smax, 1e-12)
        else:
            w_img = jnp.ones_like(s.par.score)
        w_img = w_img * self.valid_dev                # pads insert nothing

        # all classes in one dispatch: one-hot class weights, vmapped
        # insertion (Optimiser::reconstructRef's per-class loop)
        onehot = (s.cls[:, None, :] == jnp.arange(cfg.k)[None, :, None]
                  ).astype(jnp.float32)              # (2, K, L)
        if w_draw is None:
            w_l_all = onehot * (w_img / n_draw)[:, None, :]
        else:
            # per-draw compacted weights: (2, K, L, S)
            w_l_all = (onehot[..., None]
                       * (w_img[:, :, None] * w_draw)[:, None])
        self._last_vol_sharded = False
        if self._vol_sharded(grid_size):
            # big-box path: dense slices (pose-side symmetrisation) into
            # z-slab-sharded F/T — no full padded grid on any device
            self._last_vol_sharded = True
            from thunder_tpu.recon.sharded import insert_sweep_3d_sharded

            f_acc = t_acc = None
            for sl in self._ft_chunks():
                vals, c2w, rot_e, w_cls = _dense_slices_h(
                    self._ft_ori_chunk(sl),
                    _slice_l(self.data.ctf_params, sl), quats[:, sl],
                    trans[:, sl], d_draw[:, sl], w_l_all[:, :, sl],
                    self.sym.matrices, cfg.size, cfg.pf,
                    float(cfg.pixel_size), use_d, r_u, self.sym.order,
                )
                with self.mesh:
                    f_c, t_c = insert_sweep_3d_sharded(
                        self.mesh, vals, c2w, rot_e, w_cls,
                        grid_size * cfg.pf, cfg.pf)
                if f_acc is None:
                    f_acc, t_acc = f_c, t_c
                else:
                    f_acc, t_acc = f_acc + f_c, t_acc + t_c
            return f_acc, t_acc, r_u, grid_size
        chunks = self._ft_chunks()
        if (not cfg.mode_2d and cfg.reco_kernel != "mkb"
                and len(chunks) == 1):
            return self._insert_flat(quats, trans, d_draw, w_draw,
                                     w_img, w_l_all, n_draw, use_d,
                                     r_u, grid_size)
        f2 = t2 = None
        for sl in chunks:
            f_c, t_c = _insert_all_h(
                self._ft_ori_chunk(sl), _slice_l(self.data.ctf_params, sl),
                rings.mask, rings.i_col, rings.i_row, quats[:, sl],
                trans[:, sl], d_draw[:, sl], w_l_all[:, :, sl],
                self.sym.matrices,
                jnp.asarray((r_u - 1) * cfg.pf, jnp.float32),
                cfg.size, cfg.pf, cfg.mode_2d, self.sym.order, grid_size,
                float(cfg.pixel_size), use_d, r_u, cfg.reco_kernel,
            )
            f2 = f_c if f2 is None else f2 + f_c
            t2 = t_c if t2 is None else t2 + t_c
        return f2, t2, r_u, grid_size

    def _insert_flat(self, quats, trans, d_draw, w_draw, w_img, w_l_all,
                     n_draw: int, use_d: bool, r_u: int, grid_size: int):
        """Flat-slice 3D insertion (see _insert_flat3d_h): gather only
        the VALID compacted slices across each hemisphere into a
        bucketed static shape, then insert hemispheres as two
        sequential dispatches (halved peak HBM vs the vmapped pair —
        the rU-band grids at 256px silently exhausted the chip and
        returned NaN grids, the round-4 bench collapse)."""
        cfg = self.cfg
        s = self.state
        n_l = int(s.par.r.shape[1])
        if w_draw is None:
            # uncompacted draws: every slot carries weight 1/n_draw,
            # already folded into w_l_all (2, K, L) — broadcast it over
            # the slot axis to the compacted layout (2, K, L, S)
            w_draw = jnp.full((2, n_l, n_draw), 1.0 / n_draw, jnp.float32)
            w_l_all = jnp.broadcast_to(w_l_all[..., None],
                                       w_l_all.shape + (n_draw,))
        n_slots = int(w_draw.shape[-1])
        order, n_valid = _flat_slice_order_h(w_img[:, :, None] * w_draw)
        nv = max(int(self._host(jnp.max(n_valid))), 1)
        # finer rungs near the measured operating points (38-42
        # slices/image at the bench workloads): the next-power jump
        # padded 4.7k valid slices to 6.1k — 29% of reco_insert spent
        # on zero-weight pads (insert stats, BENCH_r05)
        ladder = [n_l * m for m in (2, 4, 6, 8, 12, 16, 24, 32, 40)
                  if n_l * m < n_l * n_slots] + [n_l * n_slots]
        bucket = next(b for b in ladder if b >= nv)
        # surfaced in the bench roofline: the inserter's cost model is
        # slices x work-per-slice, so stage timings are uninterpretable
        # without the actual slice count
        self._last_insert_stats = {"n_valid_slices": nv,
                                   "bucket": bucket}
        take = order[:, :bucket]                        # (2, B)
        img_idx = take // n_slots
        qf = jnp.take_along_axis(quats.reshape(2, -1, 4),
                                 take[..., None], axis=1)
        tf = jnp.take_along_axis(trans.reshape(2, -1, 2),
                                 take[..., None], axis=1)
        df = jnp.take_along_axis(d_draw.reshape(2, -1), take, axis=1)
        wf = jnp.take_along_axis(w_l_all.reshape(2, cfg.k, -1),
                                 take[:, None, :], axis=2)
        ft = self._ft_ori_chunk(self._ft_chunks()[0])
        max_rad = jnp.asarray((r_u - 1) * cfg.pf, jnp.float32)
        outs = []
        for h in range(2):
            outs.append(_insert_flat3d_h(
                ft[h], jax.tree.map(lambda a: a[h], self.data.ctf_params),
                qf[h], tf[h], df[h], wf[h], img_idx[h],
                self.sym.matrices, max_rad, cfg.size, cfg.pf,
                self.sym.order, grid_size, float(cfg.pixel_size),
                use_d, r_u))
        f2 = jnp.stack([o[0] for o in outs])
        t2 = jnp.stack([o[1] for o in outs])
        return f2, t2, r_u, grid_size

    def _vol_sharded(self, grid_size: int) -> bool:
        """True when the padded grids for this reconstruction should be
        z-slab-sharded over the mesh's data axis (SURVEY §5's
        context-parallel axis; the reference instead held whole volumes
        per rank, README.md:58-59)."""
        cfg = self.cfg
        big = grid_size * cfg.pf
        mesh = self.mesh
        return (mesh is not None and not cfg.mode_2d
                and cfg.reco_kernel != "mkb"
                and "hemi" in mesh.axis_names and "data" in mesh.axis_names
                and mesh.shape["hemi"] == 2
                and mesh.shape["data"] > 1
                and mesh.shape["data"] % 2 == 0
                and big % mesh.shape["data"] == 0
                and big ** 3 * 8 // 2 ** 20 >= cfg.vol_shard_min_mb)

    def _reconstruct_refs(self, f2, t2, fsc_all, grid_size: int, r_u: int,
                          map_wiener: bool, join_half: bool,
                          grid_corr: bool):
        """Route reconstruction to the volume-sharded path when the
        padded grids are big and a mesh is available."""
        cfg = self.cfg
        mesh = self.mesh
        if self._vol_sharded(grid_size):
            from thunder_tpu.recon.sharded import (
                reconstruct_all_sharded,
                sharded_grid_specs,
            )

            spec = sharded_grid_specs(mesh)
            f2 = jax.device_put(f2, spec)
            t2 = jax.device_put(t2, spec)
            with mesh:
                return reconstruct_all_sharded(
                    mesh, f2, t2, jnp.asarray(fsc_all), grid_size, cfg.pf,
                    r_u, map_wiener, join_half, grid_corr, cfg.size)
        return _reconstruct_all_h(
            f2, t2, jnp.asarray(fsc_all), grid_size, cfg.pf, r_u,
            map_wiener, join_half, grid_corr, cfg.size, cfg.reco_kernel)

    def _reconstruct_and_compare(self, record: dict, _mark=lambda n: None):
        """Reconstruction + cross-hemisphere FSC + conditional averaging
        — the reference's TWO-PASS scheme (reconstructRef,
        Optimiser.cpp:7310-7755):

        * pass 1 (fscFlag): reconstruct both halves with MAP **off**
          (setMAP(false), Optimiser.cpp:7328) and measure the FSC on
          them (compareTwoHemispheres(true, false));
        * pass 2 (avgFlag): reconstruct again from the SAME (F, T)
          grids with MAP **on**, Wiener-weighted by the PREVIOUS
          round's FSC with the join-half mapping (setMAP(true) +
          OPTIMISER_RECONSTRUCT_JOIN_HALF, Optimiser.cpp:7576 — the
          reco objects' FSC is re-armed by resetReco at the END of
          each round, Optimiser.cpp:4071/Model.cpp:1122, so the MAP
          pass lags the comparison by one round), then apply the
          averaging policy (compareTwoHemispheres(false, true)) whose
          0.95-crossing shell DOES come from the fresh pass-1 curve —
          THESE are the references the next round aligns against.

        A single Wiener'd pass with the previous round's FSC (rounds
        1-3 of this rebuild) under-regularises the 2D references: the
        un-damped noise beyond the signal band leaks through the
        gridding correction and costs 4-8 FSC shells per round
        (measured on the ref_parity 2D workload,
        scripts/diag_2d_parity_instr.py)."""
        cfg = self.cfg
        f2, t2, r_u, grid_size = self.reconstruct_round()
        _mark("reco_insert")

        n_shells = cfg.max_r
        fsc_prev = np.asarray(self.model.fsc, dtype=np.float32)
        if fsc_prev.shape[0] < cfg.k:
            fsc_prev = np.broadcast_to(fsc_prev[:1],
                                       (cfg.k,) + fsc_prev.shape[1:])
        ones = np.ones((cfg.k, n_shells), np.float32)
        if self._vol_sharded(grid_size):
            refs_fsc = self._reconstruct_refs(
                f2, t2, ones, grid_size, r_u, False, False, True,
            )
            refs_map = self._reconstruct_refs(
                f2, t2, fsc_prev, grid_size, r_u, True, True, True,
            )
        else:
            # both passes in one dispatch
            refs_fsc, refs_map = _reconstruct_two_h(
                f2, t2, jnp.asarray(fsc_prev), grid_size, cfg.pf, r_u,
                cfg.size, cfg.reco_kernel)
        refs_fsc = self._recentre(refs_fsc)

        # the reference SAVES the MAP-free maps (fscSave sits in the
        # fscFlag pass, Optimiser.cpp:7460); keep them for reporting
        # (class_averages / per-round reference artifacts) so saved
        # maps are undamped like the reference's
        self._refs_report = refs_fsc

        # FSC on the MAP-free pass (Model::compareTwoHemispheres,
        # Model.cpp:307-851); core/mask true-FSC variants replace the
        # plain curves for the state machine (Model.cpp:411-567)
        use_true_fsc = (not cfg.mode_2d) and (cfg.core_fsc or cfg.mask_fsc)
        fsc_dev, _, _ = _compare_refs(refs_fsc[0], refs_fsc[1], n_shells,
                                      want_avg=False)
        if use_true_fsc:
            from thunder_tpu.model import true_fsc_batch

            if cfg.mask_fsc and self._ref_mask is not None:
                if self._ref_mask_dev is None:
                    self._ref_mask_dev = jnp.asarray(self._ref_mask)
                m = self._ref_mask_dev
            else:
                m = self._soft_mask_dev()
            self.key, kf = jax.random.split(self.key)
            keys = jax.random.split(kf, cfg.k)
            fsc_all = np.asarray(self._host(true_fsc_batch(
                refs_fsc[0], refs_fsc[1], m, keys, n_shells)))
        else:
            fsc_all = np.asarray(self._host(fsc_dev))
        # the FSC exists only within the reconstruction band: the
        # reference sizes _FSC to rU (Model.cpp:316 _FSC.resize(_rU))
        # so resolutionP and the saved FSC files never see the
        # beyond-band leakage of the real-space kernel correction
        fsc_all = np.array(fsc_all)
        fsc_all[:, r_u:] = 0.0
        self._fsc_band = int(r_u)
        _mark("reco_fsc")

        # pass 2: MAP reconstruction, Wiener'd by the previous round's
        # FSC (reco FSC re-armed at round END in the reference)
        self.state.refs = self._recentre(refs_map)
        _mark("reco_wiener")

        fsc_j = jnp.asarray(fsc_all)
        if cfg.gold_standard and cfg.k == 1:
            # golden standard: average the halves below the
            # 0.95-crossing shell only (compareTwoHemispheres avgFlag)
            _, ref_a_new, ref_b_new = _compare_refs(
                self.state.refs[0], self.state.refs[1], n_shells,
                fsc=fsc_j)
            new_refs = jnp.stack([ref_a_new, ref_b_new])
        else:
            # K > 1 (classification) or no golden standard: the two
            # hemisphere references are FULLY averaged every round —
            # "When refining more than 1 references, directly average
            # two half maps" (Model.cpp:679-690); without this the
            # hemisphere class averages drift apart (measured against
            # the reference binary in scripts/ref_parity.py --mode 2D)
            avg = (self.state.refs[0] + self.state.refs[1]) / 2
            new_refs = jnp.stack([avg, avg])
        if self._sh_state is not None:
            new_refs = jax.device_put(new_refs,
                                      self._sh_state(new_refs.ndim - 1))
        self.state.refs = new_refs

        self.model.set_fsc(fsc_all)
        self.model.update_res(cfg.thres_report_fsc)

    def _recentre(self, refs):
        """Reference auto-recentring (reconstructRef, Optimiser.cpp:
        7382-7427): shift each class reference by minus the mean rank-1
        translation of its images (the O accumulator / allReduceO
        path); Cn-symmetric groups only, and only when no explicit mask
        drives the geometry.  Applied to BOTH reconstruction passes,
        as the reference's centring block runs inside each."""
        cfg = self.cfg
        if not (cfg.ref_auto_recentre and self._ref_mask is None and (
                cfg.mode_2d or self.sym.name.startswith("C"))):
            return refs
        s = self.state
        eff_t = s.par.top_t - self.offset          # (2, L, 2)
        one_hot = ((s.cls[:, None, :] == jnp.arange(cfg.k)[None, :, None])
                   .astype(jnp.float32) * self.valid_dev[:, None, :])
        cnt = jnp.maximum(jnp.sum(one_hot, axis=2), 1.0)
        o_class = jnp.einsum("hkl,hlc->hkc", one_hot, eff_t) / cnt[..., None]
        return _recentre_refs_h(refs, o_class, cfg.mode_2d)

    # -- one full round --------------------------------------------------

    def _sync_device(self):
        """Execution barrier: dispatch a tiny reduction over the live
        state and fetch it to host.  `block_until_ready` can return
        early through the remote-dispatch tunnel and complex d2h is
        unimplemented there — a float-scalar fetch of an in-order
        dispatched program is the reliable sync."""
        s = self.state
        float(_sync_scalar_h(s.par.t, s.refs, s.sigma))

    def run_round(self, i_round: int) -> dict:
        cfg = self.cfg
        t0 = time.time()
        compile_s0 = compile_seconds()
        rings = self._rings()
        record = dict(round=i_round, r=int(self.model.r),
                      search_type=int(self.model.search_type))

        # per-stage wall-clock attribution (THUNDER_STAGE_TIMING=1):
        # each mark syncs the device, so stages pay their own async
        # dispatch — the observability a practitioner tunes against
        stage_ms = None
        _mark_t = [t0]
        if os.environ.get("THUNDER_STAGE_TIMING"):
            stage_ms = record["stage_ms"] = {}
            self._sync_device()
            _mark_t[0] = time.time()

        def _mark(name):
            if stage_ms is None:
                return
            self._sync_device()
            now = time.time()
            stage_ms[name] = round((now - _mark_t[0]) * 1e3, 1)
            _mark_t[0] = now

        # choose the round's projection-table mode (brick for
        # concentrated clouds), then prime ONE table at the round's max
        # gather radius — sigma's projected band min(r+3, max_r) — so
        # every stage this round (phases at r, norm correction at
        # r_norm <= r, sigma) reuses it (a per-stage rebuild costs
        # seconds at big boxes)
        r_sig = int(self.model.r_u)
        self._round_r_sig = r_sig   # corner-row tables: crop(r_sig)
        # the table PLAN (brick margins, byte budget) keys on the PHASE
        # band — phases gather at r; only sigma/norm/reco reach rU
        r_phase = int(self.model.r)
        (self._round_brick, self._round_order,
         self._round_segs) = self._table_plan(r_phase)
        if self._round_brick:
            record["proj_table"] = "brick%s" % (self._round_brick,)
            self._brick_used.add(self._round_brick)
        self._proj_stack(pack_rings(cfg.size, r_phase, 0))
        if r_sig > r_phase:
            # the sigma/norm tier (kind None, crop(rU)) builds here too
            # so stage timings attribute both builds to build_table
            self._proj_stack(pack_rings(cfg.size, r_sig, 0), kind=None)
        _mark("build_table")

        # expectation (skipE honored as in run, Optimiser.cpp:3630)
        prev_top_r = self.state.par.top_r
        if i_round == 0 or not cfg.skip_e:
            if self.model.search_type == SEARCH_TYPE_GLOBAL and cfg.g_search:
                g = self.expectation_global(rings)
                _mark("global_search")
                self.adopt_global(g)
                _mark("adopt_global")
                # steady-state global rounds adopt already-tight clouds
                # (the top grid points dominate): re-evaluate the brick
                # choice on the POST-adoption state so the whole phase
                # loop runs on the brick table instead of waiting for
                # the first chunk boundary (~1.1 s of corner-row phases
                # per round at 256px)
                if self._round_brick is None:
                    self._round_brick = self._brick_choice(
                        rings.r_u, mid_round=True)
                    if self._round_brick:
                        self._brick_used.add(self._round_brick)
            phase_dev = self.local_phases(rings)
            if self._round_brick:
                # may have engaged mid-round (chunked phase driver)
                tag = "brick%s" % (self._round_brick,)
                if self._round_order is not None:
                    tag += "+route[%s]" % ",".join(
                        f"{n}:{r or 'oct'}" for n, r in self._round_segs)
                record["proj_table"] = tag
            _mark("phases")
        else:
            phase_dev = None
            record["n_phases"] = [0, 0]

        # per-round monitoring statistics — rotation stability
        # (refreshRotationChange) and translation variance
        # (refreshVariance / stat_MAS, Functions.cpp:254, MEDIAN —
        # stable enough for the 2% stagnation test) — plus the phase
        # counts and (K>1) the class distribution for rebirth, all
        # computed on device and drained in ONE tunnel round-trip
        pulls = {"stats": _round_stats_h(
            prev_top_r, self.state.par.top_r, self.state.par.s0,
            self.state.par.s1, self.valid_dev)}
        if phase_dev is not None:
            pulls["phase"] = phase_dev
        if cfg.k > 1:
            pulls["distr"] = _class_distr_h(
                self.state.cls, self.valid_dev, cfg.k)
        out = self._host(pulls)
        stats = np.asarray(out["stats"])
        if phase_dev is not None:
            record["n_phases"] = [int(p) for p in out["phase"]]
        record["rot_change_median_deg"] = float(
            np.degrees(2.0 * np.arccos(np.clip(stats[0], -1.0, 1.0))))
        self.model.set_t_vari(float(stats[1]), float(stats[2]))
        _mark("host_stats")

        # maximization (Optimiser::maximization, Optimiser.cpp:3405-3559;
        # skipM pins FSC to 1 instead, run :3798-3801)
        if not cfg.skip_m:
            if len(self._ft_chunks()) == 1:
                # device-resident stack: norm + sigma + scale fused
                # into one dispatch (closed-form rescale, _max_stats_h)
                self.maximization_stats(i_round)
                _mark("max_stats")
            else:
                # host-streamed originals: the norm median must be
                # global before sigma accumulates — sequential 2-pass
                if (i_round != 0
                        and self.model.search_type != SEARCH_TYPE_GLOBAL):
                    self.norm_correction()
                    _mark("norm_correction")
                self.refresh_sigma()
                _mark("sigma")
                if (self.model.search_type == SEARCH_TYPE_GLOBAL
                        and cfg.group_scl and i_round != 0):
                    self.correct_scale()
                    _mark("scale")
            if not cfg.skip_r:
                self._reconstruct_and_compare(record, _mark)
                _mark("reco_compare")
        else:
            self.model.set_fsc(np.ones((cfg.k, cfg.max_r), np.float32))

        # post-reconstruction housekeeping: class rebirth, reference
        # masking, image re-centring (run, Optimiser.cpp:3813-4014,7514)
        reborn = self.balance_classes(out.get("distr"))
        if reborn:
            record["reborn_classes"] = reborn
        self.solvent_flatten(
            cfg.perform_mask
            and (cfg.global_mask
                 or self.model.search_type != SEARCH_TYPE_GLOBAL)
        )
        # image re-centring (OPTIMISER_RECENTRE_IMAGE_EACH_ITERATION,
        # Config.h:165; only outside global search, Optimiser.cpp:3804):
        # fold the rank-1 shift into the offsets, rebuild masked spectra
        if self.model.search_type != SEARCH_TYPE_GLOBAL:
            self.re_centre_img()
            self._refresh_masked()
        _mark("mask_recentre")

        self.model.update_r(cfg.thres_cutoff_fsc)
        self.model.update_search_type()

        if getattr(self, "_last_vol_sharded", False):
            record["vol_sharded"] = True
        record["res_shell"] = int(self.model.res)
        record["res_A"] = float(self.model.res_angstrom(cfg.thres_report_fsc))
        record["elapsed_s"] = time.time() - t0
        compile_s = compile_seconds() - compile_s0
        if compile_s > 0.05:
            record["compile_s"] = round(compile_s, 2)
        record["search_type_after"] = int(self.model.search_type)
        self.round_records.append(record)
        return record

    def run(self, max_rounds: int | None = None) -> list[dict]:
        cfg = self.cfg
        n = max_rounds if max_rounds is not None else cfg.iter_max
        for i in range(n):
            self.run_round(i)
            if self.model.search_type == SEARCH_TYPE_STOP:
                break
        return self.round_records

    def final_reconstruction(self) -> np.ndarray:
        """Joint full-resolution reconstruction after the search stops
        (run, Optimiser.cpp:4078-4129: setMaxRU + reconstructRef(true,
        false, ..., finished=true) at Nyquist).  The FINAL maps are
        MAP-FREE — the finished call runs only the fscFlag pass
        (setMAP(false)); sharpening belongs to postprocess, not to an
        FSC-damped deposit.  Returns (K, ...) maps averaged over
        hemispheres; per-hemisphere maps stay in self.state.refs."""
        cfg = self.cfg
        saved_r = self.model.r
        self.model.r = cfg.max_r - 3
        f2, t2, r_u, grid_size = self.reconstruct_round()
        self.model.r = saved_r

        fsc_all = np.ones((cfg.k, cfg.max_r), np.float32)
        refs = self._reconstruct_refs(
            f2, t2, fsc_all, grid_size, r_u,
            False, False, True,
        )
        self.state.refs = refs
        self._refs_report = None     # finals live in state.refs now
        return self._host((refs[0] + refs[1]) / 2)

    def save_subtract(self, mask: np.ndarray, chunk: int = 512) -> np.ndarray:
        """Signal subtraction (saveSubtract, Optimiser.cpp:8418-...):
        per particle, subtract ctf * proj(masked reference) at the
        rank-1 pose from the original image — batched (one device
        program per chunk of images).  Returns (n, size, size) float32
        real-space images in original particle order."""
        cfg = self.cfg
        out = np.zeros((self.n_total, cfg.size, cfg.size), np.float32)
        w = jnp.asarray(mask)
        masked_refs = self.state.refs * w[None, None]
        s = self.state
        for h in (0, 1):
            proj_stack = _prepare_projectee_stack(
                masked_refs[h], cfg.size, cfg.pf, cfg.mode_2d, 0)
            eff_t = s.par.top_t[h] - self.offset[h]
            idx, val = self.index[h], self.valid[h]
            for lo in range(0, self.n_img, chunk):
                sl = slice(lo, min(self.n_img, lo + chunk))
                ft_h = (self.data.ft_ori.get(h, sl)
                        if isinstance(self.data.ft_ori, HostFt)
                        else self.data.ft_ori[h, sl])
                diff = _subtract_batch(
                    ft_h,
                    CtfParams(*[f[h, sl] for f in self.data.ctf_params]),
                    proj_stack, s.cls[h, sl], s.par.top_r[h, sl],
                    eff_t[sl], cfg.size, cfg.pf, cfg.mode_2d,
                    float(cfg.pixel_size),
                )
                sub = np.asarray(diff, dtype=np.float32)
                ok = val[sl]
                out[idx[sl][ok]] = sub[ok]
        return out

    def save_checkpoint(self, path: str):
        """Native full-state checkpoint (beyond the .thu-compatible
        one): references, sigma, particle clouds, offsets and the
        round-level state machine, restorable mid-run (SURVEY §5's
        "orbax-style native checkpoint" item)."""
        import dataclasses

        s = self.state
        blobs = dict(
            refs=np.asarray(s.refs), sigma=np.asarray(s.sigma),
            cls=np.asarray(s.cls), offset=np.asarray(self.offset),
            index=self.index, valid=self.valid,
        )
        for fname, arr in zip(s.par._fields, s.par):
            blobs[f"par_{fname}"] = np.asarray(arr)
        model = {
            f.name: getattr(self.model, f.name)
            for f in dataclasses.fields(self.model)
            if f.name != "fsc"
        }
        blobs["fsc"] = self.model.fsc
        blobs["model_json"] = np.frombuffer(
            json_dumps_bytes(model), dtype=np.uint8
        )
        blobs["key"] = np.asarray(self.key)
        np.savez_compressed(path, **blobs)

    def load_checkpoint(self, path: str):
        import dataclasses
        import json as _json

        z = np.load(path, allow_pickle=False)
        s = self.state
        s.refs = jnp.asarray(z["refs"])
        s.sigma = jnp.asarray(z["sigma"])
        s.cls = jnp.asarray(z["cls"])
        self.offset = jnp.asarray(z["offset"])
        self.index = z["index"]
        self.valid = z["valid"]
        self.n_img = self.index.shape[1]
        self.valid_dev = jnp.asarray(self.valid.astype(np.float32))
        s.par = pt.ParticleState(
            **{f: jnp.asarray(z[f"par_{f}"]) for f in s.par._fields}
        )
        model = _json.loads(bytes(z["model_json"]).decode())
        for f in dataclasses.fields(self.model):
            if f.name in model:
                setattr(self.model, f.name, model[f.name])
        self.model.fsc = z["fsc"]
        self.key = jnp.asarray(z["key"])
        if self.mesh is not None:
            self._apply_shardings()

    # -- exports ---------------------------------------------------------

    def class_assignments(self) -> np.ndarray:
        """Global class assignment array over all particles."""
        out = np.zeros(self.n_total, dtype=np.int64)
        cls = self._host(self.state.cls)
        for h in (0, 1):
            v = self.valid[h]
            out[self.index[h][v]] = cls[h][v]
        return out

    def class_averages(self) -> np.ndarray:
        """Mean of hemisphere references per class (2D stacks / 3D maps).

        Reported from the MAP-FREE reconstruction pass when one exists
        (the reference saves the fscFlag maps, not the Wiener-damped
        references the next round aligns against)."""
        refs = getattr(self, "_refs_report", None)
        if refs is None:
            refs = self.state.refs
        return self._host((refs[0] + refs[1]) / 2)

    def export_thu(self, thu):
        """Write current particle-filter compression back into a ThuTable
        (saveDatabase, Optimiser.cpp:8250-8416)."""
        import copy

        out = copy.deepcopy(thu)
        s = self.state
        for h in (0, 1):
            v = self.valid[h]
            idx = self.index[h][v]
            get = lambda a: np.asarray(a[h])[v]
            out.class_id[idx] = get(s.cls)
            out.quat[idx] = get(s.par.top_r)
            out.k1[idx] = get(s.par.k1)
            out.k2[idx] = get(s.par.k2)
            out.k3[idx] = get(s.par.k3)
            # the saved translation is against the ORIGINAL image: the
            # recentring offset accumulated by re_centre_img must come
            # out, exactly as the reference subtracts _offset under
            # OPTIMISER_RECENTRE_IMAGE_EACH_ITERATION
            # (Optimiser.cpp saveDatabase)
            out.trans[idx] = get(s.par.top_t) - get(self.offset)
            out.std_trans[idx] = np.stack(
                [get(s.par.s0), get(s.par.s1)], axis=1
            )
            out.defocus_factor[idx] = get(s.par.top_d)
            out.std_defocus_factor[idx] = get(s.par.s_d)
            out.score[idx] = get(s.par.score)
        return out
