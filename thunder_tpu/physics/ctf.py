"""Contrast transfer function.

Matches the reference exactly (src/CTF.cpp:11-151):

    lambda = 12.2643247 / sqrt(V (1 + V * 0.978466e-6))   [V in volts]
    chi    = pi lambda d f^2 + (pi/2) Cs lambda^3 f^4 - phaseShift
    CTF(f) = -w1 sin(chi) + w2 cos(chi)

with w2 = amplitude contrast, w1 = sqrt(1 - w2^2), and the astigmatic
defocus  d = -(dU + dV + (dU - dV) cos(2(theta_f - theta_d))) / 2
(dU, dV > 0 for underfocus; chi then comes out negative at low f, the
usual convention).  Everything is batched: CTF attributes are arrays of
shape (...,) and frequency grids broadcast against them.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from thunder_tpu.constants import CTF_LAMBDA_A, CTF_LAMBDA_B


class CtfParams(NamedTuple):
    """Per-image CTF attributes (reference CTFAttr, include/Database.h)."""

    voltage: jax.Array            # volts
    defocus_u: jax.Array          # angstrom
    defocus_v: jax.Array          # angstrom
    defocus_theta: jax.Array      # radians
    cs: jax.Array                 # angstrom
    amplitude_contrast: jax.Array
    phase_shift: jax.Array        # radians


def ctf_params(voltage, defocus_u, defocus_v, defocus_theta, cs,
               amplitude_contrast, phase_shift) -> CtfParams:
    as_f32 = lambda v: jnp.asarray(v, dtype=jnp.float32)
    return CtfParams(as_f32(voltage), as_f32(defocus_u), as_f32(defocus_v),
                     as_f32(defocus_theta), as_f32(cs),
                     as_f32(amplitude_contrast), as_f32(phase_shift))


def wavelength(voltage: jax.Array) -> jax.Array:
    """Electron wavelength in angstrom (CTF.cpp:18)."""
    return CTF_LAMBDA_A / jnp.sqrt(voltage * (1 + voltage * CTF_LAMBDA_B))


def ctf_1d(f: jax.Array, voltage, defocus, cs, amplitude_contrast,
           phase_shift) -> jax.Array:
    """Isotropic CTF at spatial frequency f [1/angstrom] (CTF.cpp:11-29)."""
    lam = wavelength(voltage)
    w2 = amplitude_contrast
    w1 = jnp.sqrt(1 - w2 * w2)
    k1 = jnp.pi * lam
    k2 = jnp.pi / 2 * cs * lam**3
    chi = k1 * defocus * f**2 + k2 * f**4 - phase_shift
    return -w1 * jnp.sin(chi) + w2 * jnp.cos(chi)


def _astigmatic_defocus(params: CtfParams, angle: jax.Array) -> jax.Array:
    """CTF.cpp:56-58; angle is the frequency-space polar angle."""
    rel = angle - params.defocus_theta[..., None]
    du = params.defocus_u[..., None]
    dv = params.defocus_v[..., None]
    return -(du + dv + (du - dv) * jnp.cos(2 * rel)) / 2


def ctf_packed(params: CtfParams, i_col: jax.Array, i_row: jax.Array,
               size: int, pixel_size: float) -> jax.Array:
    """CTF at packed integer frequencies (CTF.cpp:113-151).

    params fields: (...,); i_col / i_row: (npxl,) integer Fourier
    coordinates; returns (..., npxl).
    """
    fx = i_col.astype(jnp.float32) / (pixel_size * size)
    fy = i_row.astype(jnp.float32) / (pixel_size * size)
    f = jnp.sqrt(fx * fx + fy * fy)
    angle = jnp.arctan2(i_row.astype(jnp.float32), i_col.astype(jnp.float32))

    lam = wavelength(params.voltage)
    w2 = params.amplitude_contrast
    w1 = jnp.sqrt(1 - w2 * w2)
    k1 = (jnp.pi * lam)[..., None]
    k2 = (jnp.pi / 2 * params.cs * lam**3)[..., None]

    defocus = _astigmatic_defocus(params, angle)
    chi = k1 * defocus * f**2 + k2 * f**4 - params.phase_shift[..., None]
    return -w1[..., None] * jnp.sin(chi) + w2[..., None] * jnp.cos(chi)


def ctf_packed_scaled(params: CtfParams, i_col: jax.Array, i_row: jax.Array,
                      size: int, pixel_size: float,
                      defocus_factor: jax.Array) -> jax.Array:
    """CTF with a multiplicative defocus factor d (the particle filter's
    5th latent axis; Optimiser.cpp local search with CTF refine).

    defocus_factor: (..., nd); returns (..., nd, npxl).
    """
    fx = i_col.astype(jnp.float32) / (pixel_size * size)
    fy = i_row.astype(jnp.float32) / (pixel_size * size)
    f2 = fx * fx + fy * fy
    angle = jnp.arctan2(i_row.astype(jnp.float32), i_col.astype(jnp.float32))

    lam = wavelength(params.voltage)
    w2 = params.amplitude_contrast
    w1 = jnp.sqrt(1 - w2 * w2)
    k1 = jnp.pi * lam
    k2 = jnp.pi / 2 * params.cs * lam**3

    defocus = _astigmatic_defocus(params, angle)  # (..., npxl)
    chi = (k1[..., None, None] * defocus[..., None, :]
           * defocus_factor[..., :, None] * f2
           + k2[..., None, None] * f2 * f2
           - params.phase_shift[..., None, None])
    return (-w1[..., None, None] * jnp.sin(chi)
            + w2[..., None, None] * jnp.cos(chi))


def ctf_image(params: CtfParams, size: int, pixel_size: float) -> jax.Array:
    """Full CTF image over the centered frequency grid, (..., size, size).

    Frequencies are laid out centered: entry [..., c + ky, c + kx] holds
    logical frequency (kx, ky), c = size // 2 (CTF.cpp:31-66 analogue).
    """
    c = size // 2
    k = jnp.arange(size, dtype=jnp.float32) - c
    ky, kx = jnp.meshgrid(k, k, indexing="ij")
    f = jnp.sqrt(kx * kx + ky * ky) / (pixel_size * size)
    angle = jnp.arctan2(ky, kx)

    lam = wavelength(params.voltage)
    w2 = params.amplitude_contrast
    w1 = jnp.sqrt(1 - w2 * w2)
    k1 = jnp.pi * lam
    k2 = jnp.pi / 2 * params.cs * lam**3

    rel = angle - params.defocus_theta[..., None, None]
    du = params.defocus_u[..., None, None]
    dv = params.defocus_v[..., None, None]
    defocus = -(du + dv + (du - dv) * jnp.cos(2 * rel)) / 2

    chi = (k1[..., None, None] * defocus * f**2
           + k2[..., None, None] * f**4
           - params.phase_shift[..., None, None])
    return -w1[..., None, None] * jnp.sin(chi) + w2[..., None, None] * jnp.cos(chi)
