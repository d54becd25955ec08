"""Final-map postprocessing: true-FSC estimation, half-map merging,
B-factor sharpening (reference src/Postprocess.cpp:50-183).

Pipeline (all on device, host drives):
  1. mask half-maps; FSC(unmasked), FSC(masked)
  2. randomize phases above the shell where unmasked FSC crosses 0.8
  3. mask the phase-randomized maps; FSCRF
  4. true FSC = (FSCmask - FSCRF) / (1 - FSCRF) above the threshold + 2
  5. merge halves, Cref = sqrt(2FSC/(1+FSC)) weighting
  6. Guinier B-factor fit over [10 A shell, resolution shell], sharpen,
     low-pass at the resolution, soft-mask.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from thunder_tpu.constants import EDGE_WIDTH_FT
from thunder_tpu.ops.fourier import fft3_centered, ifft3_centered
from thunder_tpu.physics import spectrum
from thunder_tpu.physics.filters import fsc_weighting_filter, sharpen
from thunder_tpu.physics.spectrum import b_factor_est, fsc as fsc_fn, random_phase

B_FACTOR_EST_LOW_RES = 10.0  # angstrom (include/Postprocess.h:28)


@dataclass
class PostprocessResult:
    map_sharp: np.ndarray      # real space FFT layout
    map_avg: np.ndarray
    fsc_true: np.ndarray
    fsc_unmask: np.ndarray
    fsc_mask: np.ndarray
    b_factor: float
    res_shell: int
    res_angstrom: float


def postprocess(map_a: np.ndarray, map_b: np.ndarray, mask: np.ndarray,
                pixel_size: float, key=None,
                fsc_thres: float = 0.143) -> PostprocessResult:
    """map_a/map_b/mask: (size,)^3 real-space FFT-layout arrays."""
    if key is None:
        key = jax.random.PRNGKey(0)
    size = map_a.shape[-1]
    max_r = size // 2 - 1

    a = jnp.asarray(map_a)
    b = jnp.asarray(map_b)
    m = jnp.asarray(mask)

    fa = fft3_centered(a)
    fb = fft3_centered(b)
    fam = fft3_centered(a * m)
    fbm = fft3_centered(b * m)

    fsc_unmask = np.asarray(fsc_fn(fa, fb, max_r))
    fsc_mask = np.asarray(fsc_fn(fam, fbm, max_r))

    thres_shell = spectrum.res_p(fsc_unmask, 0.8, pf=1, r_l=1)

    ka, kb = jax.random.split(key)
    fa_rf = random_phase(fa, ka, thres_shell)
    fb_rf = random_phase(fb, kb, thres_shell)
    fam_rf = fft3_centered(ifft3_centered(fa_rf) * m)
    fbm_rf = fft3_centered(ifft3_centered(fb_rf) * m)
    fsc_rf = np.asarray(fsc_fn(fam_rf, fbm_rf, max_r))

    fsc_true = np.array(fsc_mask)
    hi = np.arange(max_r) >= thres_shell + 2
    denom = np.maximum(1 - fsc_rf, 1e-6)
    fsc_true[hi] = ((fsc_mask - fsc_rf) / denom)[hi]

    res_shell = spectrum.res_p(fsc_true, fsc_thres, pf=1, r_l=1)
    res_angstrom = (
        1.0 / spectrum.res_p2a(max(res_shell, 1), size, pixel_size)
    )

    merged = (fa + fb) / 2
    avg_rl = np.asarray(ifft3_centered(merged))

    weighted = fsc_weighting_filter(merged, jnp.asarray(fsc_true, jnp.float32))
    b_low_shell = int(round(spectrum.res_a2p(1.0 / B_FACTOR_EST_LOW_RES, size,
                                             pixel_size)))
    b_factor = float(b_factor_est(weighted, max(res_shell, b_low_shell + 2),
                                  b_low_shell))
    sharp = sharpen(weighted, res_shell / size, EDGE_WIDTH_FT / size, b_factor)
    sharp_rl = ifft3_centered(sharp) * m
    return PostprocessResult(
        map_sharp=np.asarray(sharp_rl),
        map_avg=avg_rl,
        fsc_true=fsc_true,
        fsc_unmask=fsc_unmask,
        fsc_mask=fsc_mask,
        b_factor=b_factor,
        res_shell=res_shell,
        res_angstrom=res_angstrom,
    )
