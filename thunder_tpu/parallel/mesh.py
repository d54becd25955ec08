"""Device mesh + sharded E-M step.

The reference's process topology (src/Parallel.cpp:17-67) — master rank,
hemisphere A = odd ranks, hemisphere B = even ranks, chunked >2GB
MPI_Allreduce_Large collectives (Parallel.cpp:158-347), plus NCCL
reductions inside a node on the GPU path (gpu/src/cuthunder.cu:297-345)
— maps onto ONE jax mesh with axes ``("hemi", "data")``:

  * hemi axis (size 2): the golden-standard split.  Each half of the
    mesh holds its own references, sigma and particle chunk; the two
    halves only meet in the FSC/averaging step (an all-gather over
    "hemi" replaces the lead->master ssend/recv of Model.cpp:375-389).
  * data axis: particle images are sharded; the F/T accumulator sums
    become psum over "data" (XLA lowers to ICI all-reduce; both the
    MPI and the NCCL tier of the reference collapse into this one
    collective).
  * the master *process* disappears: round-level control runs on host.

``sharded_em_step`` is the multi-chip training step: one jitted SPMD
program containing a local-search phase, sigma-aware likelihoods and
scatter insertion, with shardings declared via NamedSharding so the
partitioner inserts exactly the collectives above.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from thunder_tpu import particle as pt
from thunder_tpu.geometry.quaternion import rotate2d_from_unit, rotate3d
from thunder_tpu.ops.insert import (
    hermitianize,
    hermitianize_real,
    insert_slices_2d,
    insert_slices_3d,
)
from thunder_tpu.ops.likelihood import log_dvp_local
from thunder_tpu.ops.projector import (
    Projectee,
    prepare_projectee_2d,
    prepare_projectee_3d,
    project_2d,
    project_3d,
)
from thunder_tpu.recon.reconstructor import reconstruct


def make_mesh(n_devices: int | None = None, hemi: int = 2) -> Mesh:
    """Mesh with axes (hemi, data).  hemi=2 for golden standard; the
    remaining devices form the data axis."""
    devices = np.asarray(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % hemi != 0:
        raise ValueError(f"{n} devices not divisible by hemi={hemi}")
    return Mesh(devices.reshape(hemi, n // hemi), axis_names=("hemi", "data"))


def hemi_data_sharding(mesh: Mesh, extra_dims: int = 0) -> NamedSharding:
    """Sharding for arrays (hemi, L, ...): hemi over hemi, L over data."""
    return NamedSharding(mesh, P("hemi", "data", *([None] * extra_dims)))


def replicated_per_hemi(mesh: Mesh, extra_dims: int = 0) -> NamedSharding:
    """Sharding for per-hemisphere state (hemi, ...): replicated along data."""
    return NamedSharding(mesh, P("hemi", *([None] * extra_dims)))


def _translate_phases(i_col, i_row, size, trans):
    phase = (2 * jnp.pi / size) * (
        i_col.astype(jnp.float32) * trans[..., 0:1]
        + i_row.astype(jnp.float32) * trans[..., 1:2]
    )
    return jax.lax.complex(jnp.cos(phase), -jnp.sin(phase))


@partial(
    jax.jit,
    static_argnames=("size", "pf", "mode", "r_u", "n_draw"),
)
def sharded_em_step(key, ft_imgs, ctf, sig_rcp, refs, par: pt.ParticleState,
                    cls, i_col, i_row, size: int, pf: int, mode: int,
                    r_u: int, n_draw: int):
    """One sharded E-M step over the (hemi, data) mesh.

    Inputs carry a leading hemi axis of size 2:
      ft_imgs (2, L, P) complex   packed data pixels      [P("hemi","data")]
      ctf     (2, L, P) float                              [P("hemi","data")]
      sig_rcp (2, L, P) float                              [P("hemi","data")]
      refs    (2, K, size, ...) float real-space           [P("hemi")]
      par     ParticleState fields with leading (2, L)     [P("hemi","data")]
      cls     (2, L) int32                                 [P("hemi","data")]

    Runs: perturb -> likelihood -> resample -> draw poses -> scatter
    insertion -> (implicit psum over data when grids leave the sharded
    region) -> per-hemisphere reconstruction -> cross-hemisphere FSC.

    Returns (new refs (2, K, size, ...), fsc (K, size//2), new par, key).
    """
    mode_2d = mode == pt.MODE_2D
    k_cls = refs.shape[1]
    big = size * pf
    nd = 2 if mode_2d else 3

    prep = prepare_projectee_2d if mode_2d else prepare_projectee_3d
    project = project_2d if mode_2d else project_3d

    def per_hemi(key, ft, ctf_h, s_h, refs_h, par_h, cls_h):
        from thunder_tpu.ops.projector import ri_split

        proj_stack = ri_split(
            jnp.stack([prep(refs_h[t], pf).ft for t in range(k_cls)])
        )

        # particle-filter phase
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        par_h = pt.perturb_r(k1, par_h, 0.5, mode)
        par_h = pt.perturb_t(k2, par_h, 0.5, 2.0)

        dat_w = (s_h * ctf_h).astype(jnp.complex64) * ft
        sctf2 = s_h * ctf_h * ctf_h
        a_term = jnp.sum(s_h * jnp.abs(ft) ** 2, axis=-1)
        tra = _translate_phases(i_col, i_row, size, par_h.t)
        if mode_2d:
            rot = rotate2d_from_unit(par_h.r[..., :2])
        else:
            rot = rotate3d(par_h.r)
        rings = _Rings(i_col, i_row, size)
        from thunder_tpu.ops.projector import project_classed

        pri = project_classed(proj_stack, cls_h, rot, rings, pf, mode_2d)
        dvp = log_dvp_local(dat_w, sctf2, pri, tra, a_term)
        base = jnp.max(dvp, axis=(1, 2), keepdims=True)
        w = jnp.exp(dvp - base)
        par_h = par_h._replace(
            u_r=jnp.einsum("lrt,lt->lr", w, par_h.w_t),
            u_t=jnp.einsum("lrt,lr->lt", w, par_h.w_r),
        )
        par_h = pt.resample_r(k3, par_h, par_h.r.shape[1])
        par_h = pt.resample_t(k4, par_h, par_h.t.shape[1])

        # insertion
        quats, trans, _ = pt.draw_poses(k5, par_h, n_draw)
        tra_d = _translate_phases(i_col, i_row, size, trans)
        dat_al = ft[:, None, :] * jnp.conj(tra_d)
        f_grids = []
        t_grids = []
        for t in range(k_cls):
            w_l = (cls_h == t).astype(jnp.float32) / n_draw
            vals = dat_al * ctf_h[:, None, :] * w_l[:, None, None]
            ctf2w = (ctf_h * ctf_h)[:, None, :] * w_l[:, None, None]
            if mode_2d:
                rot_d = rotate2d_from_unit(quats[..., :2])
                f0 = jnp.zeros((big, big), jnp.complex64)
                t0 = jnp.zeros((big, big), jnp.float32)
                fg, tg = insert_slices_2d(
                    f0, t0, vals, ctf2w, rot_d, i_col, i_row, pf,
                    (r_u - 1) * pf,
                )
            else:
                rot_d = rotate3d(quats)
                f0 = jnp.zeros((big,) * 3, jnp.complex64)
                t0 = jnp.zeros((big,) * 3, jnp.float32)
                fg, tg = insert_slices_3d(
                    f0, t0, vals, ctf2w, rot_d, i_col, i_row, pf,
                    (r_u - 1) * pf,
                )
            f_grids.append(hermitianize(fg))
            t_grids.append(hermitianize_real(tg))
        return jnp.stack(f_grids), jnp.stack(t_grids), par_h

    keys = jax.random.split(key, 2)
    f_all, t_all, par_new = jax.vmap(per_hemi)(
        keys, ft_imgs, ctf, sig_rcp, refs, par, cls
    )
    # f_all: (2, K, big, ...) — cross-hemisphere FSC + per-hemi recon
    from thunder_tpu.physics.spectrum import fsc as fsc_fn

    n_shells = size // 2
    fsc_curves = []
    new_refs = []
    for t in range(k_cls):
        est0 = f_all[0, t] / jnp.maximum(t_all[0, t], 1.0)
        est1 = f_all[1, t] / jnp.maximum(t_all[1, t], 1.0)
        curve = fsc_fn(est0, est1, n_shells * pf)[::pf][:n_shells]
        fsc_curves.append(curve)
        per_h = []
        for h in range(2):
            vol = reconstruct(
                f_all[h, t], t_all[h, t], curve, size, pf, r_u,
                map_wiener=not mode_2d,
            )
            per_h.append(vol)
        new_refs.append(jnp.stack(per_h))
    new_refs = jnp.stack(new_refs, axis=1)        # (2, K, ...)
    fsc_all = jnp.stack(fsc_curves)               # (K, n_shells)
    return new_refs, fsc_all, par_new


class _Rings:
    """Duck-typed PackedRings view for project_* inside jit."""

    def __init__(self, i_col, i_row, size):
        self.i_col = i_col
        self.i_row = i_row
        self.size = size
