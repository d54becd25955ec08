"""Hermitian half-space projection tables (oct_pack_half) must agree
with the full-cube corner-row tables: same gather values, half the
bytes.  Reference semantics: half-space storage + conjugate fold on
access (include/Image/Volume.h:393-480 getFTHalf)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from thunder_tpu.geometry.quaternion import (
    random_quat,
    rotate2d_from_unit,
    rotate3d,
)
from thunder_tpu.ops.fourier import pack_rings
from thunder_tpu.ops.projector import (
    oct_pack,
    oct_pack_half,
    project_classed,
    project_ri,
    ri_split,
)


@pytest.mark.parametrize("mode_2d", [False, True])
def test_half_table_matches_full(mode_2d):
    rng = np.random.default_rng(0)
    B, K, L, R = 32, 2, 6, 5
    shape = (K, B, B) if mode_2d else (K, B, B, B)
    axes = tuple(range(1, len(shape)))
    real = rng.standard_normal(shape).astype(np.float32)
    spec = np.fft.fftshift(np.fft.fftn(real, axes=axes),
                           axes=axes).astype(np.complex64)
    packed = ri_split(jnp.asarray(spec), pack_bf16=True)
    full = oct_pack(packed, mode_2d)
    half = oct_pack_half(packed, mode_2d)
    assert half.size * 2 == full.size

    rings = pack_rings(B, B // 2 - 2, 0)
    cls = jnp.asarray(rng.integers(0, K, L), jnp.int32)
    if mode_2d:
        phi = rng.uniform(0, 2 * np.pi, (L, R))
        rot = rotate2d_from_unit(
            jnp.asarray(np.stack([np.cos(phi), np.sin(phi)], -1)))
    else:
        rot = rotate3d(random_quat(jax.random.PRNGKey(1), (L, R)))

    a = np.asarray(project_classed(full, cls, rot, rings, 1, mode_2d))
    b = np.asarray(project_classed(half, cls, rot, rings, 1, mode_2d))
    np.testing.assert_allclose(b, a, rtol=0, atol=2e-6 * np.abs(a).max())

    a1 = np.asarray(project_ri(full[0], rot, rings, 1, mode_2d))
    b1 = np.asarray(project_ri(half[0], rot, rings, 1, mode_2d))
    np.testing.assert_allclose(b1, a1, rtol=0, atol=2e-6 * np.abs(a1).max())


def test_zoom_dft_cropped_matches_fft_crop():
    """prepare_projectee_3d_cropped must equal the central crop of
    prepare_projectee_3d(...).ft (the 512^3-FFT path it replaces)."""
    from thunder_tpu.ops.projector import (prepare_projectee_3d,
                                           prepare_projectee_3d_cropped)

    rng = np.random.default_rng(3)
    size, pf, crop = 24, 2, 20
    ref = jnp.asarray(rng.standard_normal((size,) * 3), jnp.float32)
    full = np.asarray(prepare_projectee_3d(ref, pf).ft)
    big = size * pf
    c, cc = big // 2, crop // 2
    want = full[c - cc:c - cc + crop,
                c - cc:c - cc + crop,
                c - cc:c - cc + crop]
    got = np.asarray(prepare_projectee_3d_cropped(ref, pf, crop))
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=3e-5 * np.abs(want).max())
