"""Per-class model state and the resolution / search-type state machine.

Replaces the reference Model (src/Model.cpp).  All of this is cheap
once-per-round host logic (the reference runs it on the master rank);
device state (reference volumes, F/T grids) lives in the optimiser.

State machine semantics (Model.cpp:1147-1516, default build flags):
  * updateR: if translation variance (max over classes of s0, s1) failed
    to shrink by >2% for MAX_ITER_R_CHANGE_NO_DECREASE_{GLOBAL=2,LOCAL=0}
    consecutive rounds, elevate the frequency cutoff r
    (MODEL_DETERMINE_INCREASE_R_T_VARI, Config.h:141).
  * elevateR: GLOBAL: r += ceil((rGlobal - rInit)/2) capped by FSC-resolution+1
    and rGlobal; LOCAL/CTF: r grows by min(r*sqrt(1.5), r + (maxR-rGlobal)/8).
  * searchType: GLOBAL -> LOCAL once r reaches rGlobal and increaseR fired;
    LOCAL -> CTF (if ctf search enabled) or STOP after
    MAX_ITER_RES_NO_IMPROVE rounds without top-resolution improvement.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from thunder_tpu.physics import spectrum

SEARCH_TYPE_STOP = -1
SEARCH_TYPE_GLOBAL = 0
SEARCH_TYPE_LOCAL = 1
SEARCH_TYPE_CTF = 2

MAX_ITER_R_CHANGE_NO_DECREASE_GLOBAL = 2   # include/Model.h:52
MAX_ITER_R_CHANGE_NO_DECREASE_LOCAL = 0    # include/Model.h:54
MAX_ITER_R_CHANGE_NO_DECREASE_CTF = 0      # include/Model.h:56
MAX_ITER_RES_NO_IMPROVE = 2                # include/Model.h (LOCAL/CTF exit)
T_VARI_DECREASE = 0.02                     # include/Model.h:72-76
CUTOFF_BEYOND_RES = 0                      # include/Model.h:101


@dataclass
class ModelState:
    """Host-side scalar state of the E-M driver."""

    n_class: int
    size: int
    pixel_size: float
    r_init: int
    r_global: int
    max_r: int
    l_search: bool = True
    c_search: bool = False

    r: int = 0                       # current frequency cutoff (shells)
    res: int = 1                     # current reported resolution (shells)
    res_top: int = 1                 # best resolution seen (shells)
    search_type: int = SEARCH_TYPE_GLOBAL
    search_type_prev: int = SEARCH_TYPE_GLOBAL
    increase_r: bool = False
    n_r_change_no_decrease: int = 0
    n_top_res_no_improve: int = 0
    t_vari_s0: float = math.inf
    t_vari_s1: float = math.inf
    t_vari_s0_prev: float = math.inf
    t_vari_s1_prev: float = math.inf
    fsc: np.ndarray = field(default=None)    # (n_class, max_r)

    def __post_init__(self):
        if self.r == 0:
            self.r = min(self.r_init, self.r_global)
        if self.fsc is None:
            self.fsc = np.ones((self.n_class, self.max_r))

    # -- FSC bookkeeping -------------------------------------------------

    @property
    def r_u(self) -> int:
        """Reconstruction / FSC frequency boundary: a THIRD OF NYQUIST
        above the alignment cutoff (Model::updateRU, Model.cpp:1543:
        rU = min(r + AROUND(maxR/3), maxR)) — the carried model
        resolution runs ahead of the search radius, which is what lets
        updateR elevate r toward a crossing measured BEYOND it."""
        return min(self.r + round(self.max_r / 3), self.max_r)

    def set_fsc(self, fsc: np.ndarray) -> None:
        self.fsc = np.atleast_2d(np.asarray(fsc))

    def resolution_p(self, thres: float, per_class_best: bool = True) -> int:
        """Best class resolution at the given FSC threshold (shells)."""
        best = 1
        for t in range(self.fsc.shape[0]):
            best = max(best, spectrum.res_p(self.fsc[t], thres, pf=1, r_l=1))
        return best

    def update_res(self, thres_report: float) -> None:
        self.res = self.resolution_p(thres_report)
        if self.res > self.res_top:
            # res_top update happens in search_type step (reference keeps
            # _resT update there too); kept here for reporting symmetry
            pass

    # -- translation-variance tracking ----------------------------------

    def set_t_vari(self, s0: float, s1: float) -> None:
        self.t_vari_s0_prev = self.t_vari_s0
        self.t_vari_s1_prev = self.t_vari_s1
        self.t_vari_s0 = float(s0)
        self.t_vari_s1 = float(s1)

    def _determine_increase_r(self) -> bool:
        no_shrink = (
            self.t_vari_s0 > (1 - T_VARI_DECREASE) * self.t_vari_s0_prev
            and self.t_vari_s1 > (1 - T_VARI_DECREASE) * self.t_vari_s1_prev
        )
        if no_shrink:
            self.n_r_change_no_decrease += 1
        else:
            self.n_r_change_no_decrease = 0
        if self.search_type == SEARCH_TYPE_STOP:
            self.increase_r = False
        elif self.search_type == SEARCH_TYPE_GLOBAL:
            self.increase_r = (
                self.n_r_change_no_decrease >= MAX_ITER_R_CHANGE_NO_DECREASE_GLOBAL
            )
        elif self.search_type == SEARCH_TYPE_LOCAL:
            self.increase_r = (
                self.n_r_change_no_decrease >= MAX_ITER_R_CHANGE_NO_DECREASE_LOCAL
            )
        else:
            self.increase_r = (
                self.n_r_change_no_decrease >= MAX_ITER_R_CHANGE_NO_DECREASE_CTF
            )
        return self.increase_r

    def update_r(self, thres_cutoff: float) -> None:
        """Model::updateR + elevateR (Model.cpp:1147-1246)."""
        if self._determine_increase_r():
            res_fsc = self.resolution_p(thres_cutoff) + 1 + CUTOFF_BEYOND_RES
            if self.search_type == SEARCH_TYPE_GLOBAL:
                step = math.ceil((self.r_global - self.r_init) / 2)
                self.r = max(self.r, min(res_fsc, self.r + step))
                self.r = min(self.r, self.r_global)
            else:
                grown = min(
                    math.ceil(self.r * math.sqrt(1.5)),
                    math.ceil(self.r + (self.max_r - self.r_global) / 8),
                )
                self.r = max(self.r, min(res_fsc, grown))
            self.r = min(self.r, self.max_r)
            # frequency elevated: reset the stagnation tracking
            self.n_r_change_no_decrease = 0
            self.t_vari_s0 = math.inf
            self.t_vari_s1 = math.inf
            self.t_vari_s0_prev = math.inf
            self.t_vari_s1_prev = math.inf

    # -- search-type transitions ----------------------------------------

    def update_search_type(self) -> int:
        """Model::searchType (Model.cpp:1417-1516)."""
        self.search_type_prev = self.search_type
        if self.search_type == SEARCH_TYPE_STOP:
            return self.search_type

        if self.search_type in (SEARCH_TYPE_LOCAL, SEARCH_TYPE_CTF):
            if self.increase_r:
                if self.res > self.res_top:
                    self.res_top = self.res
                    self.n_top_res_no_improve = 0
                else:
                    self.n_top_res_no_improve += 1
                if self.n_top_res_no_improve >= MAX_ITER_RES_NO_IMPROVE:
                    if self.search_type == SEARCH_TYPE_LOCAL and self.c_search:
                        self.search_type = SEARCH_TYPE_CTF
                        self._reset_after_transition()
                    else:
                        self.search_type = SEARCH_TYPE_STOP
        else:  # GLOBAL
            if self.increase_r:
                if self.r == self.r_global:
                    if self.l_search:
                        self.search_type = SEARCH_TYPE_LOCAL
                        self._reset_after_transition()
                    else:
                        self.search_type = SEARCH_TYPE_STOP
        return self.search_type

    def _reset_after_transition(self):
        self.n_top_res_no_improve = 0
        self.n_r_change_no_decrease = 0
        self.increase_r = False
        self.t_vari_s0 = math.inf
        self.t_vari_s1 = math.inf
        self.t_vari_s0_prev = math.inf
        self.t_vari_s1_prev = math.inf

    # -- reporting -------------------------------------------------------

    def res_angstrom(self, thres: float) -> float:
        p = self.resolution_p(thres)
        if p <= 0:
            return math.inf
        return 1.0 / spectrum.res_p2a(p, self.size, self.pixel_size)




def _true_fsc_dev(a, b, m, key, n_shells: int):
    """Traced body of true_fsc — the 0.8-crossing shell is computed on
    device so the whole correction is ONE program with ONE host pull
    (the host-threshold version cost 3 tunnel round-trips per class
    per round)."""
    import jax
    import jax.numpy as jnp
    from thunder_tpu.ops.fourier import fft2_centered, fft3_centered, \
        ifft2_centered, ifft3_centered
    from thunder_tpu.physics.spectrum import fsc as fsc_fn, random_phase

    ndim = a.ndim
    fftc = fft3_centered if ndim == 3 else fft2_centered
    ifftc = ifft3_centered if ndim == 3 else ifft2_centered

    fa, fb = fftc(a), fftc(b)
    fsc_unmask = fsc_fn(fa, fb, n_shells)
    # res_p(fsc, 0.8, pf=1, r_l=1) on device: first shell >= 1 where
    # the curve drops below the threshold (else n_shells), minus 1
    idx = jnp.arange(n_shells)
    below = (fsc_unmask < 0.8) & (idx >= 1)
    first = jnp.where(jnp.any(below), jnp.argmax(below), n_shells)
    thres_shell = first - 1

    ka, kb = jax.random.split(key)
    fa_rf = random_phase(fa, ka, thres_shell)
    fb_rf = random_phase(fb, kb, thres_shell)
    fsc_rf = fsc_fn(fftc(ifftc(fa_rf) * m), fftc(ifftc(fb_rf) * m),
                    n_shells)
    fsc_mask = fsc_fn(fftc(a * m), fftc(b * m), n_shells)

    hi = idx >= thres_shell + 2
    corrected = (fsc_mask - fsc_rf) / jnp.maximum(1 - fsc_rf, 1e-6)
    return jnp.where(hi, corrected, fsc_mask)


_TRUE_FSC_JIT: dict = {}


def true_fsc_batch(refs_a, refs_b, mask, keys, n_shells: int):
    """All-classes true FSC as one device program, returned UNDRAINED
    (a (K, n_shells) device array) so the caller can batch the pull."""
    import jax

    fn = _TRUE_FSC_JIT.get("batch")
    if fn is None:
        def _batch(ra, rb, m, ks, n_shells: int):
            return jax.vmap(
                lambda a, b, k: _true_fsc_dev(a, b, m, k, n_shells)
            )(ra, rb, ks)

        fn = jax.jit(_batch, static_argnames=("n_shells",))
        _TRUE_FSC_JIT["batch"] = fn
    return fn(refs_a, refs_b, mask, keys, n_shells=n_shells)


def true_fsc(ref_a, ref_b, mask, n_shells: int, key) -> np.ndarray:
    """Randomized-phase-corrected masked FSC ("true FSC",
    Model.cpp:411-567 / the core-FSC and mask-FSC branches):

      1. plain FSC of the unmasked refs -> 0.8-crossing shell
      2. randomize phases above it, mask both random-phase and true
         refs, FSC both
      3. above crossing+2: FSC_true = (FSC_mask - FSC_rf)/(1 - FSC_rf)

    ref_a/ref_b/mask: real-space FFT-layout arrays (device or numpy).
    """
    import jax
    import jax.numpy as jnp

    fn = _TRUE_FSC_JIT.get("one")
    if fn is None:
        fn = jax.jit(_true_fsc_dev, static_argnames=("n_shells",))
        _TRUE_FSC_JIT["one"] = fn
    return np.asarray(fn(jnp.asarray(ref_a), jnp.asarray(ref_b),
                         jnp.asarray(mask), jnp.asarray(key),
                         n_shells=n_shells))
