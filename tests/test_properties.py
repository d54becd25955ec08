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


def test_sharded_step_matches_single_device():
    """The sharded E-M step must produce identical results regardless of
    how many devices the (hemi, data) mesh uses — the TPU analogue of
    the reference's MPI-vs-serial equivalence it never tested."""
    from thunder_tpu import particle as pt
    from thunder_tpu.parallel.mesh import (
        make_mesh,
        hemi_data_sharding,
        replicated_per_hemi,
        sharded_em_step,
    )

    size, pf, k_cls = 16, 2, 1
    n_img, n_r, n_t, n_draw = 8, 4, 4, 4
    r_u = size // 2 - 2
    rings = pack_rings(size, r_u)
    p = rings.i_col.shape[0]

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    ft = (jax.random.normal(k1, (2, n_img, p))
          + 1j * jax.random.normal(k2, (2, n_img, p))).astype(jnp.complex64)
    ctf = jnp.ones((2, n_img, p), jnp.float32)
    sig_rcp = -0.5 * jnp.ones((2, n_img, p)) * rings.mask
    refs = jnp.ones((2, k_cls, size, size, size), jnp.float32)
    cls = jnp.zeros((2, n_img), jnp.int32)
    par0 = pt.init_particles(k3, 2 * n_img, n_r, n_t, 1, 2.0, pt.MODE_3D)
    par = jax.tree.map(lambda a: a.reshape((2, n_img) + a.shape[1:]), par0)

    step_key = jax.random.PRNGKey(7)
    args = (step_key, ft, ctf, sig_rcp, refs, par, cls,
            rings.i_col, rings.i_row)
    kw = dict(size=size, pf=pf, mode=pt.MODE_3D, r_u=r_u, n_draw=n_draw)

    # single device
    refs1, fsc1, _ = sharded_em_step(*args, **kw)

    # 8-device mesh
    mesh = make_mesh(8, hemi=2)
    with mesh:
        ft_s = jax.device_put(ft, hemi_data_sharding(mesh, 1))
        ctf_s = jax.device_put(ctf, hemi_data_sharding(mesh, 1))
        sig_s = jax.device_put(sig_rcp, hemi_data_sharding(mesh, 1))
        refs_s = jax.device_put(refs, replicated_per_hemi(mesh, 4))
        cls_s = jax.device_put(cls, hemi_data_sharding(mesh, 0))
        par_s = jax.tree.map(
            lambda a: jax.device_put(
                a, hemi_data_sharding(mesh, a.ndim - 2)
            ),
            par,
        )
        refs8, fsc8, _ = sharded_em_step(
            step_key, ft_s, ctf_s, sig_s, refs_s, par_s, cls_s,
            rings.i_col, rings.i_row, **kw,
        )

    np.testing.assert_allclose(np.asarray(fsc1), np.asarray(fsc8),
                               rtol=1e-3, atol=1e-4)
    # psum/gather reassociation propagates through the nonlinear 1/|C|
    # balance chain, so the reconstructed refs agree only loosely in
    # low-signal regions; demand strong global correlation instead
    a = np.asarray(refs1).ravel()
    b = np.asarray(refs8).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.98, f"refs correlation {corr}"  # noise input + 1/|C| chain is chaotic
