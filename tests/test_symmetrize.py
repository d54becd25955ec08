"""Volume symmetrization (SYMMETRIZE_FT analogue) and symmetry-aware
pose folding."""

import numpy as np
import jax
import jax.numpy as jnp

from thunder_tpu.geometry import Symmetry
from thunder_tpu.geometry.quaternion import quat_mul, random_quat
from thunder_tpu.ops.projector import _gather_trilinear_3d
from thunder_tpu.recon.reconstructor import symmetrize_ft


def test_symmetrize_ft_c4_invariance():
    rng = np.random.default_rng(0)
    size = 24
    c = size // 2
    grid = jnp.asarray(
        rng.normal(size=(size,) * 3) + 1j * rng.normal(size=(size,) * 3)
    ).astype(jnp.complex64)
    sym = Symmetry("C4")
    out = symmetrize_ft(grid, sym.matrices, c - 3)

    # rotating the symmetrized volume by the generator changes nothing
    # (sample both at rotated coords and compare inside the radius)
    k = jnp.arange(size, dtype=jnp.float32) - c
    kz, ky, kx = jnp.meshgrid(k, k, k, indexing="ij")
    rot = np.asarray(sym.matrices[1])  # 90 deg about z
    x = rot[0, 0] * kx + rot[0, 1] * ky + rot[0, 2] * kz
    y = rot[1, 0] * kx + rot[1, 1] * ky + rot[1, 2] * kz
    z = rot[2, 0] * kx + rot[2, 1] * ky + rot[2, 2] * kz
    rotated = _gather_trilinear_3d(out, x, y, z)
    inside = (kx**2 + ky**2 + kz**2) < (c - 5) ** 2
    a = np.asarray(jnp.where(inside, out, 0))
    b = np.asarray(jnp.where(inside, rotated, 0))
    # trilinear resampling blurs; compare by correlation
    corr = np.corrcoef(
        np.concatenate([a.real[inside.__array__()], a.imag[inside.__array__()]]),
        np.concatenate([b.real[inside.__array__()], b.imag[inside.__array__()]]),
    )[0, 1]
    assert corr > 0.9, corr


def test_counterpart_idempotent_under_symmetry():
    """Folding q and folding s*q give the same representative."""
    sym = Symmetry("D2")
    q = random_quat(jax.random.PRNGKey(0), (16,))
    folded = sym.counterpart(q)
    for i in range(1, sym.order):
        q2 = quat_mul(jnp.broadcast_to(sym.quats[i], q.shape), q)
        folded2 = sym.counterpart(q2)
        dots = np.abs(np.sum(np.asarray(folded) * np.asarray(folded2), axis=1))
        # same asymmetric-unit representative up to sign
        assert (dots > 0.99).mean() > 0.8
