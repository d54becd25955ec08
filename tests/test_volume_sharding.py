"""Volume (z-slab) sharding of the reconstruction grids — the
big-box/"context-parallel" axis (SURVEY §5).  The reference keeps whole
padded volumes per rank and segfaulted at ~1000 px boxes
(/root/reference/README.md:58-59); here the F/T/W/C grids and the
balance-loop FFTs are sharded across the data axis."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _random_grids(key, k_cls, big):
    from thunder_tpu.ops.insert import hermitianize, hermitianize_real

    ks = jax.random.split(key, 3)
    f = (jax.random.normal(ks[0], (2, k_cls, big, big, big))
         + 1j * jax.random.normal(ks[1], (2, k_cls, big, big, big))
         ).astype(jnp.complex64)
    t = jnp.abs(jax.random.normal(ks[2], (2, k_cls, big, big, big))
                ).astype(jnp.float32) + 0.1
    # real accumulations are Hermitian (F) / even (T); the unsharded
    # finalizer's irfftn assumes it
    f = jax.vmap(jax.vmap(hermitianize))(f)
    t = jax.vmap(jax.vmap(hermitianize_real))(t)
    return f, t


def test_sharded_reconstruction_matches_unsharded():
    from thunder_tpu.optimiser import _reconstruct_all_h
    from thunder_tpu.parallel.mesh import make_mesh
    from thunder_tpu.recon.sharded import (
        reconstruct_all_sharded,
        sharded_grid_specs,
    )

    size, pf, k_cls = 32, 2, 2
    big = size * pf
    max_radius = size // 2 - 2
    f, t = _random_grids(jax.random.PRNGKey(0), k_cls, big)
    fsc = jnp.linspace(1.0, 0.2, size // 2)[None, :].repeat(k_cls, 0)

    ref = _reconstruct_all_h(f, t, fsc, size, pf, max_radius,
                             True, False, True, size)

    mesh = make_mesh(8, hemi=2)
    with mesh:
        f_s = jax.device_put(f, sharded_grid_specs(mesh))
        t_s = jax.device_put(t, sharded_grid_specs(mesh))
        out = reconstruct_all_sharded(mesh, f_s, t_s, fsc, size, pf,
                                      max_radius, True, False, True, size)

    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=2e-3, atol=2e-4)


def test_sharded_reconstruction_join_half_and_resize():
    """join-half Wiener + cropped-grid Fourier upsampling, sharded."""
    from thunder_tpu.optimiser import _reconstruct_all_h
    from thunder_tpu.parallel.mesh import make_mesh
    from thunder_tpu.recon.sharded import (
        reconstruct_all_sharded,
        sharded_grid_specs,
    )

    grid_size, out_size, pf = 24, 32, 2
    big = grid_size * pf
    max_radius = grid_size // 2 - 2
    f, t = _random_grids(jax.random.PRNGKey(1), 1, big)
    fsc = jnp.linspace(0.9, 0.1, out_size // 2)[None]

    ref = _reconstruct_all_h(f, t, fsc, grid_size, pf, max_radius,
                             True, True, True, out_size)
    mesh = make_mesh(8, hemi=2)
    with mesh:
        f_s = jax.device_put(f, sharded_grid_specs(mesh))
        t_s = jax.device_put(t, sharded_grid_specs(mesh))
        out = reconstruct_all_sharded(mesh, f_s, t_s, fsc, grid_size, pf,
                                      max_radius, True, True, True,
                                      out_size)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=2e-3, atol=2e-4)


def test_sharded_insertion_matches_unsharded_sweep():
    """insert_sweep_3d_sharded accumulates z-slab-sharded F/T that
    match the single-device sweep exactly (same math, different
    placement)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from thunder_tpu.geometry.quaternion import random_quat, rotate3d
    from thunder_tpu.ops.insert import insert_sweep_3d
    from thunder_tpu.parallel.mesh import make_mesh
    from thunder_tpu.recon.sharded import insert_sweep_3d_sharded

    pf, r_u = 2, 8
    nk = 2 * r_u - 1
    big = 2 * (pf * r_u + 2)
    n_b, k_cls = 24, 2
    rng = np.random.default_rng(0)

    kk = np.arange(nk) - (r_u - 1)
    ky, kx = np.meshgrid(kk, kk, indexing="ij")
    q2 = kx**2 + ky**2
    mask = ((q2 < (r_u - 1) ** 2).astype(np.float32)
            * np.where(q2 == 0, 2.0, 1.0))
    vals = np.asarray(
        (rng.standard_normal((2, n_b, nk, nk))
         + 1j * rng.standard_normal((2, n_b, nk, nk))) * mask,
        np.complex64)
    ctf2w = np.asarray(rng.random((2, n_b, nk, nk)) * mask, np.float32)
    rots = np.asarray(rotate3d(random_quat(jax.random.PRNGKey(7),
                                           (2, n_b))))
    w_cls = np.asarray(rng.random((2, k_cls, n_b)), np.float32)

    ref = [insert_sweep_3d(jnp.asarray(vals[h]), jnp.asarray(ctf2w[h]),
                           jnp.asarray(rots[h]), jnp.asarray(w_cls[h]),
                           big, pf, chunk=8) for h in (0, 1)]

    mesh = make_mesh(8, hemi=2)
    with mesh:
        sh = lambda a, spec: jax.device_put(
            jnp.asarray(a), NamedSharding(mesh, spec))
        f_s, t_s = insert_sweep_3d_sharded(
            mesh,
            sh(vals, P("hemi", "data")), sh(ctf2w, P("hemi", "data")),
            sh(rots, P("hemi", "data")),
            sh(w_cls, P("hemi", None, "data")),
            big, pf, chunk=4)

    # really sharded: z-slabs on devices
    assert max(s.data.nbytes for s in f_s.addressable_shards) \
        <= f_s.nbytes // 4
    for h in (0, 1):
        np.testing.assert_allclose(np.asarray(t_s[h]),
                                   np.asarray(ref[h][1]),
                                   rtol=1e-4, atol=1e-5)
        # complex values compared directly (not |.|): a conjugation or
        # sign error in the sharded F grid must fail this gate
        np.testing.assert_allclose(np.asarray(f_s[h]),
                                   np.asarray(ref[h][0]),
                                   rtol=1e-4, atol=1e-5)


def test_optimiser_routes_to_sharded_reconstruction():
    """The production Optimiser engages the volume-sharded path (forced
    via vol_shard_min_mb=0) and converges like the unsharded run."""
    import sys
    sys.path.insert(0, "tests")
    from test_e2e_3d import make_3d_dataset
    from thunder_tpu.config import ThunderConfig
    from thunder_tpu.optimiser import Optimiser
    from thunder_tpu.parallel.mesh import make_mesh
    from thunder_tpu.physics.ctf import ctf_params

    size, n = 24, 16
    phantom, imgs, true_q, true_t = make_3d_dataset(size, n, snr=2.0)
    kw = dict(
        mode="3D", k=1, size=size, pixel_size=1.0, mask_radius=10.0,
        trans_s=1.5, init_res=4.0, global_search_res=3.0, sym="C1",
        m_s=256, m_l_r=12, m_l_t=9, m_reco=8,
        ignore_res=size * 1.0, trans_search_factor=0.25,
        ref_auto_recentre=False,
    )
    ctf = ctf_params(
        np.full(n, 300e3), np.full(n, 500.0), np.full(n, 500.0),
        np.zeros(n), np.full(n, 2e7), np.full(n, 0.1), np.zeros(n),
    )
    mesh = make_mesh(8, hemi=2)

    opt1 = Optimiser(ThunderConfig(**kw), imgs, ctf, np.zeros(n, np.int64),
                     init_refs=phantom, mesh=mesh)
    with mesh:
        opt1.run_round(0)

    cfg_sh = ThunderConfig(**kw, vol_shard_min_mb=0)
    opt2 = Optimiser(cfg_sh, imgs, ctf, np.zeros(n, np.int64),
                     init_refs=phantom, mesh=mesh)
    with mesh:
        opt2.run_round(0)

    r1 = np.asarray(opt1.state.refs)
    r2 = np.asarray(opt2.state.refs)
    assert np.all(np.isfinite(r2))
    # same inputs, same draws (same seed): the reconstructions agree up
    # to the balance loop's stopping rule (the unsharded path iterates
    # in rfft half-space, the sharded one in full complex space, so the
    # convergence test can stop one iteration apart -> ~2% deviations)
    assert np.corrcoef(r1.ravel(), r2.ravel())[0, 1] > 0.999
    np.testing.assert_allclose(r1, r2, rtol=0.1, atol=0.15)


def test_optimiser_sharded_round_with_symmetry():
    """The sharded big-box round with a symmetric particle: pose-side
    symmetrisation (insert at R_s^-1-rotated poses) must agree with the
    unsharded grid-side SYMMETRIZE_FT."""
    import sys
    sys.path.insert(0, "tests")
    from test_e2e_3d import make_3d_dataset
    from thunder_tpu.config import ThunderConfig
    from thunder_tpu.optimiser import Optimiser
    from thunder_tpu.parallel.mesh import make_mesh
    from thunder_tpu.physics.ctf import ctf_params

    size, n = 24, 16
    phantom, imgs, true_q, true_t = make_3d_dataset(size, n, snr=2.0)
    kw = dict(
        mode="3D", k=1, size=size, pixel_size=1.0, mask_radius=10.0,
        trans_s=1.5, init_res=4.0, global_search_res=3.0, sym="C2",
        m_s=128, m_l_r=8, m_l_t=6, m_reco=6,
        ignore_res=size * 1.0, trans_search_factor=0.25,
        ref_auto_recentre=False,
    )
    ctf = ctf_params(
        np.full(n, 300e3), np.full(n, 500.0), np.full(n, 500.0),
        np.zeros(n), np.full(n, 2e7), np.full(n, 0.1), np.zeros(n),
    )
    mesh = make_mesh(8, hemi=2)
    opt1 = Optimiser(ThunderConfig(**kw), imgs, ctf, np.zeros(n, np.int64),
                     init_refs=phantom, mesh=mesh)
    with mesh:
        opt1.run_round(0)
    opt2 = Optimiser(ThunderConfig(**kw, vol_shard_min_mb=0), imgs, ctf,
                     np.zeros(n, np.int64), init_refs=phantom, mesh=mesh)
    with mesh:
        opt2.run_round(0)
    r1 = np.asarray(opt1.state.refs)
    r2 = np.asarray(opt2.state.refs)
    assert np.all(np.isfinite(r2))
    # grid-side symmetrisation resamples the grid trilinearly, the
    # pose-side one re-inserts — O(h^2)-different kernels (plus the
    # inserter's bf16 height-weight stream), so compare statistically
    assert np.corrcoef(r1.ravel(), r2.ravel())[0, 1] > 0.985


@pytest.mark.slow
def test_sharded_512px_memory():
    """512px-box reconstruction grids sharded over 8 devices: per-device
    shard bytes strictly below the full-volume size (the criterion that
    makes ≥1000 px boxes reachable at all).  The numeric
    reconstruct+distributed-upsample run uses a 256px output box — the
    identical code path with an affordable out^3 iFFT on the 1-core CPU
    test host (the 512^3 output FFT alone is ~4 min there; on real
    chips the distributed iFFT splits it d ways over ICI)."""
    from thunder_tpu.parallel.mesh import make_mesh
    from thunder_tpu.recon.sharded import (
        reconstruct_all_sharded,
        sharded_grid_specs,
    )

    pf = 2
    mesh = make_mesh(8, hemi=2)
    spec = sharded_grid_specs(mesh)

    # memory criterion at the 512px-box grid sizes (cropped
    # reconstructor grid 128 -> padded 256^3 insertion grids)
    big512 = 256
    f512 = jax.device_put(
        jnp.ones((2, 1, big512, big512, big512), jnp.complex64), spec)
    full_bytes = big512 ** 3 * 8
    assert max(s.data.nbytes
               for s in f512.addressable_shards) <= full_bytes // 4
    del f512

    out_size = 256
    grid_size = 128              # cropped reconstructor grid (r_u = 60)
    big = grid_size * pf
    max_radius = 60
    f = jax.device_put(
        jnp.ones((2, 1, big, big, big), jnp.complex64), spec)
    t = jax.device_put(
        jnp.full((2, 1, big, big, big), 2.0, jnp.float32), spec)

    fsc = jnp.linspace(1.0, 0.3, out_size // 2)[None]
    with mesh:
        # grid_corr=False: wiener + final distributed iFFT + upsample
        # (the balance loop's distributed FFTs are covered above)
        out = reconstruct_all_sharded(mesh, f, t, fsc, grid_size, pf,
                                      max_radius, True, False, False,
                                      out_size)
    out = np.asarray(out)
    assert out.shape == (2, 1, out_size, out_size, out_size)
    assert np.all(np.isfinite(out))


def test_mkb_refused_under_volume_sharding():
    """reco_kernel='mkb' + a data-axis mesh + boxes past the sharding
    threshold must fail at CONFIG time, not silently fall back to
    whole-volume grids (VERDICT r4 missing #4; the MKB blob is not
    separable over the sweep's 1D passes, Reconstructor.cpp:424-567)."""
    from thunder_tpu.config import ThunderConfig
    from thunder_tpu.optimiser import Optimiser
    from thunder_tpu.parallel.mesh import make_mesh
    from thunder_tpu.physics.ctf import ctf_params

    size, n = 24, 16
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((n, size, size)).astype(np.float32)
    ctf = ctf_params(
        np.full(n, 300e3), np.full(n, 500.0), np.full(n, 500.0),
        np.zeros(n), np.full(n, 2e7), np.full(n, 0.1), np.zeros(n),
    )
    mesh = make_mesh(8, hemi=2)
    kw = dict(
        mode="3D", k=1, size=size, pixel_size=1.0, mask_radius=10.0,
        trans_s=1.5, init_res=4.0, global_search_res=3.0, sym="C1",
        m_s=64, m_l_r=8, m_l_t=6, m_reco=4, ignore_res=size * 1.0,
        reco_kernel="mkb", vol_shard_min_mb=0,
    )
    with pytest.raises(ValueError, match="mkb"):
        Optimiser(ThunderConfig(**kw), imgs, ctf,
                  np.zeros(n, np.int64), mesh=mesh)

    # below the sharding threshold the same config is accepted
    kw["vol_shard_min_mb"] = 10 ** 6
    Optimiser(ThunderConfig(**kw), imgs, ctf, np.zeros(n, np.int64),
              mesh=mesh)
