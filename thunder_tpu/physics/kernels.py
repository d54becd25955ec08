"""Gridding interpolation kernels.

The reference's defaults (include/Config.h:37,95-97): trilinear
insertion kernel (``RECONSTRUCTOR_TRILINEAR_KERNEL``) with the modified
Kaiser-Bessel blob of order 0 available as an option
(``FUNCTIONS_MKB_ORDER_0``).  Formulas from src/Functions/Functions.cpp:
  * TIK_RL(r) = sinc(pi r)^2          (Functions.cpp:236; GSL spherical j0)
  * NIK_RL(r) = sinc(pi r)            (Functions.cpp:241)
  * MKB_FT(r; a, alpha)  = I0(alpha sqrt(1-(r/a)^2)) / I0(alpha)
  * MKB_RL(r; a, alpha)  = (2 pi)^{3/2} a^3 / I0(alpha) / v^{3/2} * B(v)
      with u = 2 pi a r, v = sqrt(|alpha^2 - u^2|),
      B = I_{3/2} inside (u <= alpha), J_{3/2} outside
  * MKB_BLOB_VOL(a, alpha) = (2 pi / alpha)^{3/2} I_{3/2}(alpha)/I0(alpha) a^3

Half-integer Bessels use their closed forms, so there is no tabulation
(the reference's TabFunction becomes exact VPU math).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import i0


def _sinc(x):
    """sin(x)/x, safe at 0 (this is GSL's spherical bessel j0)."""
    return jnp.sinc(x / jnp.pi)


def tik_rl(r):
    """FT of the trilinear interpolation kernel, radial approx (TIK_RL)."""
    return _sinc(jnp.pi * r) ** 2


def nik_rl(r):
    """FT of the nearest-neighbour interpolation kernel (NIK_RL)."""
    return _sinc(jnp.pi * r)


def _i_three_half(x):
    """Modified Bessel I_{3/2}(x) = sqrt(2/(pi x)) (cosh x - sinh(x)/x)."""
    x = jnp.maximum(x, 1e-12)
    return jnp.sqrt(2 / (jnp.pi * x)) * (jnp.cosh(x) - jnp.sinh(x) / x)


def _j_three_half(x):
    """Bessel J_{3/2}(x) = sqrt(2/(pi x)) (sin(x)/x - cos x)."""
    x = jnp.maximum(x, 1e-12)
    return jnp.sqrt(2 / (jnp.pi * x)) * (jnp.sin(x) / x - jnp.cos(x))


def mkb_ft(r, a: float, alpha: float):
    """Fourier-space MKB blob profile (order 0), zero outside r > a."""
    u2 = (r / a) ** 2
    inside = u2 <= 1.0
    val = i0(alpha * jnp.sqrt(jnp.maximum(0.0, 1 - u2))) / i0(jnp.asarray(alpha, r.dtype if hasattr(r, "dtype") else jnp.float32))
    return jnp.where(inside, val, 0.0)


def mkb_rl(r, a: float, alpha: float):
    """Real-space transform of the MKB blob (order 0); Functions.cpp:168-178.

    Note the reference evaluates I_{3/2} inside the main lobe (u <= alpha)
    and J_{3/2} outside; order-0 uses nu = 1.5.
    """
    u = 2 * jnp.pi * a * r
    a2 = alpha * alpha
    inside = u <= alpha
    v = jnp.sqrt(jnp.abs(a2 - u * u))
    w = (2 * jnp.pi) ** 1.5 * a**3 / i0(jnp.asarray(alpha, jnp.float32)) / jnp.maximum(v, 1e-12) ** 1.5
    return w * jnp.where(inside, _i_three_half(v), _j_three_half(v))


def mkb_rl_r2(r2, a: float, alpha: float):
    """mkb_rl on squared radius (Functions.cpp:181-216), used by the
    reconstructor's C-convolution which feeds QUAD(i,j,k)/ (N pf)^2."""
    return mkb_rl(jnp.sqrt(jnp.maximum(r2, 0.0)), a, alpha)


def mkb_blob_vol(a: float, alpha: float):
    """Volume (integral) of the MKB blob (Functions.cpp:218-233)."""
    import numpy as np

    def i0_np(x):
        import scipy.special as sp  # CPU-side constant; scipy ships with jax deps

        return sp.i0(x)

    try:
        i0a = i0_np(alpha)
        i32 = float(np.sqrt(2 / (np.pi * alpha)) * (np.cosh(alpha) - np.sinh(alpha) / alpha))
        return float((2 * np.pi / alpha) ** 1.5 * i32 / i0a * a**3)
    except ImportError:  # pragma: no cover
        x = jnp.asarray(alpha, jnp.float32)
        return float((2 * jnp.pi / alpha) ** 1.5 * _i_three_half(x) / i0(x) * a**3)
