"""Property tests the reference never had (SURVEY §4): adjointness of
project/backproject and single-device vs sharded-mesh consistency."""

import numpy as np
import jax
import jax.numpy as jnp

from thunder_tpu.geometry.quaternion import random_quat, rotate3d
from thunder_tpu.ops.fourier import pack_rings
from thunder_tpu.ops.insert import insert_slices_3d
from thunder_tpu.ops.projector import prepare_projectee_3d, project_3d
from thunder_tpu.ops.projector import _gather_trilinear_3d


def test_project_backproject_adjoint():
    """<P v, w> == <v, P^T w> for the slice-extraction operator with
    trilinear interpolation: projecting with project_3d and inserting
    with insert_slices_3d use transposed index/weight patterns."""
    size, pf = 16, 1
    big = size * pf
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)

    rot = rotate3d(random_quat(key, (3,)))
    rings = pack_rings(size, size // 2 - 2)
    p = rings.i_col.shape[0]

    v = jnp.asarray(
        rng.normal(size=(big,) * 3) + 1j * rng.normal(size=(big,) * 3)
    ).astype(jnp.complex64)
    w = jnp.asarray(
        (rng.normal(size=(3, p)) + 1j * rng.normal(size=(3, p)))
        * np.asarray(rings.mask)
    ).astype(jnp.complex64)

    # forward: gather slices from v (use raw gather at the same coords
    # insert_slices_3d scatters to: pf * freq, no grid correction)
    fx = (rings.i_col * pf).astype(jnp.float32)
    fy = (rings.i_row * pf).astype(jnp.float32)
    x = rot[..., 0, 0:1] * fx + rot[..., 0, 1:2] * fy
    y = rot[..., 1, 0:1] * fx + rot[..., 1, 1:2] * fy
    z = rot[..., 2, 0:1] * fx + rot[..., 2, 1:2] * fy
    pv = _gather_trilinear_3d(v, x, y, z)

    # adjoint: scatter w into the grid with the same weights
    f0 = jnp.zeros((big,) * 3, jnp.complex64)
    t0 = jnp.zeros((big,) * 3, jnp.float32)
    ptw, _ = insert_slices_3d(
        f0, t0, w[:, None, :], jnp.zeros((3, 1, p)),
        rot[:, None], rings.i_col, rings.i_row, pf, size // 2 - 1,
    )

    lhs = jnp.sum(pv * jnp.conj(w))
    rhs = jnp.sum(v * jnp.conj(ptw))
    np.testing.assert_allclose(
        complex(lhs), complex(rhs), rtol=1e-3,
    )


def test_sharded_insertion_matches_single_device():
    """The PRODUCTION insertion stage (_insert_all_h: both hemispheres'
    scatter-add into per-class F/T grids) must produce identical grids
    on a (hemi, data) mesh and on one device — this is the psum over
    "data" that replaces MPI_Allreduce_Large + NCCL
    (Reconstructor.cpp:2350-2484, cuthunder.cu:297-345), validated at
    the op where the collective actually appears."""
    from thunder_tpu.optimiser import _insert_all_h
    from thunder_tpu.parallel.mesh import (
        make_mesh,
        hemi_data_sharding,
        replicated_per_hemi,
    )
    from thunder_tpu.physics.ctf import ctf_params

    size, pf, k_cls = 16, 2, 2
    n_img, n_draw = 8, 3
    r_u = size // 2 - 2
    rings = pack_rings(size, r_u)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    ft_ori = (jax.random.normal(ks[0], (2, n_img, size, size))
              + 1j * jax.random.normal(ks[1], (2, n_img, size, size))
              ).astype(jnp.complex64)
    cp = ctf_params(
        jnp.full((2, n_img), 300e3), jnp.full((2, n_img), 2000.0),
        jnp.full((2, n_img), 2200.0), jnp.zeros((2, n_img)),
        jnp.full((2, n_img), 2e7), jnp.full((2, n_img), 0.1),
        jnp.zeros((2, n_img)),
    )
    quats = random_quat(ks[2], (2, n_img, n_draw))
    trans = jax.random.normal(ks[3], (2, n_img, n_draw, 2)) * 2.0
    d_draw = jnp.ones((2, n_img, n_draw))
    cls = jax.random.randint(ks[4], (2, n_img), 0, k_cls)
    w_l = ((cls[:, None, :] == jnp.arange(k_cls)[None, :, None])
           .astype(jnp.float32) / n_draw)
    sym_mats = jnp.eye(3)[None]
    max_rad = jnp.asarray((r_u - 1) * pf, jnp.float32)

    args = (ft_ori, cp, rings.mask, rings.i_col, rings.i_row, quats,
            trans, d_draw, w_l, sym_mats, max_rad)
    kw = dict(size=size, pf=pf, mode_2d=False, n_sym=1, grid_size=size,
              pixel_size=1.0, use_d=False, r_u=r_u)

    f1, t1 = _insert_all_h(*args, **kw)

    mesh = make_mesh(8, hemi=2)
    with mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = lambda a, e: jax.device_put(a, hemi_data_sharding(mesh, e))
        # w_l is (hemi, K, L): images on the LAST axis here
        w_l_s = jax.device_put(
            w_l, NamedSharding(mesh, P("hemi", None, "data")))
        args_s = (
            sh(ft_ori, 2),
            ctf_params(*[sh(f, 0) for f in cp]),
            rings.mask, rings.i_col, rings.i_row,
            sh(quats, 2), sh(trans, 2), sh(d_draw, 1), w_l_s,
            sym_mats, max_rad,
        )
        f8, t8 = _insert_all_h(*args_s, **kw)

    np.testing.assert_allclose(np.asarray(t1), np.asarray(t8),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f8),
                               rtol=1e-4, atol=1e-5)
