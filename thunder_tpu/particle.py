"""The 5D particle filter, batched over images.

Re-design of the reference Particle (src/Particle.cpp, include/Particle.h):
per image, a fixed-shape set of support points over the latent space —
class c, rotation quaternion r, translation t, defocus factor d — with
prior weights w* and likelihoods u*.  The reference's per-image loops
become vmapped array programs; adaptive support counts become fixed
shapes chosen per search stage.

State arrays (L = images on this shard):
    r (L, nR, 4), t (L, nT, 2), d (L, nD)
    w_r/w_t/w_d prior weights, u_r/u_t/u_d likelihoods
    top_r/top_t/top_d rank-1 poses, k1/k2/k3, s0/s1, s_d variances

All operations are jittable; randomness flows through explicit
jax.random keys (one split per op), replacing GSL per-thread engines.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from thunder_tpu.constants import (
    PEAK_FACTOR_BASE,
    PEAK_FACTOR_C,
    PEAK_FACTOR_MAX,
    PEAK_FACTOR_MIN,
    PERTURB_K_MAX,
)
from thunder_tpu.geometry.directional import (
    infer_acg_k123,
    infer_acg_mean,
    infer_acg_matrix,
    infer_vms,
    inv_det4_spd,
    sample_acg,
    sample_vms,
    vms_kappa,
)
from thunder_tpu.geometry.quaternion import quat_conj, quat_mul, quat_normalize

MODE_2D = 2
MODE_3D = 3

# chi-square quantiles used by the reference (GSL cdf calls); hardcoded
# to avoid a scipy dependency inside jit
_CHI2_PPF_TRANSQ_2 = 5.991464547107981  # chisq Qinv(0.05, 2)
_CHI2_CDF_1_2 = 0.3934693402873666      # chisq P(1, 2)
_CHI2_CDF_1_1 = 0.6826894921370859      # chisq P(1, 1)

# variance floors: a fully-collapsed support cloud (all points equal)
# would freeze the perturbation forever AND defeat the reference's
# stagnation test (0 > 0.98*0 is false) — the reference sketches the
# same guard as MIN_STD_FACTOR (include/Optimiser.h:69).  Floors keep
# sub-pixel / sub-degree precision while keeping the filter alive.
MIN_STD_T = 0.1      # pixels
MIN_K_R = 1e-5       # rotation concentration (angle ~ sqrt(k) ~ 0.2 deg)
MIN_STD_D = 1e-4     # defocus factor


class ParticleState(NamedTuple):
    r: jax.Array       # (L, nR, 4)
    t: jax.Array       # (L, nT, 2)
    d: jax.Array       # (L, nD)
    w_r: jax.Array     # (L, nR)
    w_t: jax.Array     # (L, nT)
    w_d: jax.Array     # (L, nD)
    u_r: jax.Array
    u_t: jax.Array
    u_d: jax.Array
    top_r: jax.Array   # (L, 4)
    top_t: jax.Array   # (L, 2)
    top_d: jax.Array   # (L,)
    k1: jax.Array      # (L,)
    k2: jax.Array
    k3: jax.Array
    s0: jax.Array
    s1: jax.Array
    s_d: jax.Array
    score: jax.Array

    @property
    def n_images(self):
        return self.r.shape[0]

    @property
    def n_r(self):
        return self.r.shape[1]

    @property
    def n_t(self):
        return self.t.shape[1]

    @property
    def n_d(self):
        return self.d.shape[1]


def init_particles(key: jax.Array, n_images: int, n_r: int, n_t: int,
                   n_d: int, trans_s: float, mode: int) -> ParticleState:
    """Fresh support for global search (Particle::reset, Particle.cpp:87-170):
    uniform rotations, Gaussian(trans_s) translations, defocus = 1."""
    kr, kt = jax.random.split(key)
    if mode == MODE_2D:
        phi = jax.random.uniform(kr, (n_images, n_r), minval=0.0,
                                 maxval=2 * jnp.pi)
        r = jnp.stack(
            [jnp.cos(phi), jnp.sin(phi), jnp.zeros_like(phi), jnp.zeros_like(phi)],
            axis=-1,
        )
    else:
        r = quat_normalize(jax.random.normal(kr, (n_images, n_r, 4)))
    t = jax.random.normal(kt, (n_images, n_t, 2)) * trans_s
    d = jnp.ones((n_images, n_d), dtype=jnp.float32)
    uni = lambda n: jnp.full((n_images, n), 1.0 / n, dtype=jnp.float32)
    zeros = jnp.zeros((n_images,), dtype=jnp.float32)
    return ParticleState(
        r=r.astype(jnp.float32), t=t.astype(jnp.float32), d=d,
        w_r=uni(n_r), w_t=uni(n_t), w_d=uni(n_d),
        u_r=uni(n_r), u_t=uni(n_t), u_d=uni(n_d),
        top_r=r[:, 0].astype(jnp.float32), top_t=t[:, 0].astype(jnp.float32),
        top_d=d[:, 0],
        k1=zeros + 1.0, k2=zeros + 1.0, k3=zeros + 1.0,
        s0=zeros + trans_s, s1=zeros + trans_s, s_d=zeros,
        score=zeros,
    )


def from_thu(quat: np.ndarray, trans: np.ndarray, std_trans: np.ndarray,
             k123: np.ndarray, defocus: np.ndarray, std_d: np.ndarray,
             n_r: int, n_t: int, n_d: int, key: jax.Array,
             mode: int) -> ParticleState:
    """Resume support from .thu columns (Particle::load, Particle.cpp:401):
    rebuild each image's cloud around the saved top pose with the saved
    concentrations, then mark the saved pose as rank-1."""
    n_images = quat.shape[0]
    kr, kt, kd = jax.random.split(key, 3)
    quat = jnp.asarray(quat, dtype=jnp.float32)
    k1 = jnp.asarray(k123[:, 0], dtype=jnp.float32)
    k2 = jnp.asarray(k123[:, 1], dtype=jnp.float32)
    k3 = jnp.asarray(k123[:, 2], dtype=jnp.float32)

    if mode == MODE_2D:
        def draw_r(k, q, kk1):
            v = sample_vms(k, jnp.asarray([1.0, 0.0]), jnp.minimum(kk1, 1.0), n_r)
            d4 = jnp.concatenate([v, jnp.zeros((n_r, 2))], axis=-1)
            return quat_mul(jnp.broadcast_to(q, (n_r, 4)), d4)
    else:
        def draw_r(k, q, kk1):
            # anisotropy collapsed to k1 on resume; refined next round
            pert = sample_acg(k, kk1, kk1, kk1, n_r)
            return quat_mul(pert, jnp.broadcast_to(q, (n_r, 4)))

    keys_r = jax.random.split(kr, n_images)
    r = jax.vmap(draw_r)(keys_r, quat, jnp.maximum(k1, 1e-5))
    r = r.at[:, 0].set(quat)

    std_t = jnp.asarray(std_trans, dtype=jnp.float32)
    t0 = jnp.asarray(trans, dtype=jnp.float32)
    t = (t0[:, None, :]
         + jax.random.normal(kt, (n_images, n_t, 2)) * std_t[:, None, :])
    t = t.at[:, 0].set(t0)

    d0 = jnp.asarray(defocus, dtype=jnp.float32)
    sd = jnp.asarray(std_d, dtype=jnp.float32)
    d = d0[:, None] + jax.random.normal(kd, (n_images, n_d)) * sd[:, None]
    d = d.at[:, 0].set(d0)

    uni = lambda n: jnp.full((n_images, n), 1.0 / n, dtype=jnp.float32)
    return ParticleState(
        r=r, t=t, d=d,
        w_r=uni(n_r), w_t=uni(n_t), w_d=uni(n_d),
        u_r=uni(n_r), u_t=uni(n_t), u_d=uni(n_d),
        top_r=quat, top_t=t0, top_d=d0,
        k1=k1, k2=k2, k3=k3,
        s0=std_t[:, 0], s1=std_t[:, 1], s_d=sd,
        score=jnp.zeros((n_images,), jnp.float32),
    )


def init_d_round(key: jax.Array, state: ParticleState,
                 s_d: float) -> ParticleState:
    """Particle::initD at the start of EVERY CTF-search round
    (Optimiser.cpp:1195-1196 calls initD(mLD, ctfRefineS) in the
    phase-0 branch): the defocus support RE-SCATTERS around exactly 1
    with std ctfRefineS (PARTICLE_DEFOCUS_INIT_GAUSSIAN, Config.h:59;
    Particle.cpp:281-312), weights uniform, and s_d re-measured from
    the fresh sample (calVari PAR_D, Particle.cpp:1138).

    This per-round re-init is the reference's defocus EXPLORATION
    mechanism: a persistent d cloud's std shrinks under resampling
    round over round, starving the random walk (the measured 32px
    median-d gap, BASELINE.md round-4 diagnosis); re-initialising
    restores a fixed exploration width every round while topD keeps
    the running estimate."""
    n_d = state.d.shape[-1]
    d = 1.0 + jax.random.normal(key, state.d.shape) * s_d
    uni = jnp.full(state.d.shape, 1.0 / n_d, dtype=jnp.float32)
    state = state._replace(d=d.astype(jnp.float32), w_d=uni, u_d=uni)
    return cal_vari_d(state)


# -- variance inference (Particle::calVari, Particle.cpp:1004-1142) -----


def cal_vari_r(state: ParticleState, mode: int) -> ParticleState:
    if mode == MODE_2D:
        _, k = infer_vms(state.r[..., :2])
        k = jnp.maximum(k, MIN_K_R)
        return state._replace(k1=k, k2=k, k3=k)

    def one(r):
        mean = infer_acg_mean(r)
        centered = quat_mul(jnp.broadcast_to(quat_conj(mean), r.shape), r)
        k1, k2, k3 = infer_acg_k123(centered)
        return k1, k2, k3

    k1, k2, k3 = jax.vmap(one)(state.r)
    return state._replace(k1=jnp.maximum(k1, MIN_K_R),
                          k2=jnp.maximum(k2, MIN_K_R),
                          k3=jnp.maximum(k3, MIN_K_R))


def cal_vari_t(state: ParticleState) -> ParticleState:
    s0 = jnp.maximum(jnp.std(state.t[..., 0], axis=-1, ddof=1), MIN_STD_T)
    s1 = jnp.maximum(jnp.std(state.t[..., 1], axis=-1, ddof=1), MIN_STD_T)
    return state._replace(s0=s0, s1=s1)


def cal_vari_d(state: ParticleState) -> ParticleState:
    n_d = state.d.shape[-1]
    if n_d == 1:
        return state._replace(s_d=jnp.zeros_like(state.s_d))
    s = jnp.maximum(jnp.std(state.d, axis=-1, ddof=1), MIN_STD_D)
    return state._replace(s_d=s)


def cal_score(state: ParticleState, mode: int) -> ParticleState:
    """score = compressR (Particle.cpp:647-678)."""
    if mode == MODE_2D:
        score = 1.0 / jnp.maximum(state.k1, 1e-12)
    else:
        score = jnp.power(
            jnp.maximum(state.k1 * state.k2 * state.k3, 1e-30), -1.0 / 6
        )
    return state._replace(score=score)


# -- perturbation (Particle::perturb, Particle.cpp:1149-1289) -----------


def perturb_r(key: jax.Array, state: ParticleState, pf: float,
              mode: int) -> ParticleState:
    n_images, n_r = state.r.shape[:2]
    keys = jax.random.split(key, n_images)
    if mode == MODE_2D:
        def one(k, r, k1):
            v = sample_vms(k, jnp.asarray([1.0, 0.0]),
                           jnp.minimum(PERTURB_K_MAX, k1 * pf), n_r)
            d4 = jnp.concatenate([v, jnp.zeros((n_r, 2))], axis=-1)
            return quat_mul(r, d4)

        r = jax.vmap(one)(keys, state.r, state.k1)
    else:
        def one(k, r, k1, k2, k3):
            pert = sample_acg(
                k,
                pf * pf * jnp.minimum(PERTURB_K_MAX, k1),
                pf * pf * jnp.minimum(PERTURB_K_MAX, k2),
                pf * pf * jnp.minimum(PERTURB_K_MAX, k3),
                n_r,
            )
            mean = infer_acg_mean(r)
            mean_b = jnp.broadcast_to(mean, r.shape)
            centered = quat_mul(jnp.broadcast_to(quat_conj(mean), r.shape), r)
            return quat_mul(mean_b, quat_mul(pert, centered))

        r = jax.vmap(one)(keys, state.r, state.k1, state.k2, state.k3)
    state = state._replace(r=r)
    return balance_weight_r(state, mode)


def perturb_t(key: jax.Array, state: ParticleState, pf: float,
              trans_s: float) -> ParticleState:
    n_images, n_t = state.t.shape[:2]
    noise = jax.random.normal(key, (n_images, n_t, 2))
    t = state.t + noise * jnp.stack([state.s0, state.s1], axis=-1)[:, None, :] * pf
    # reCentre (Particle.cpp reCentre + PARTICLE_RECENTRE_TRANSQ):
    # resample outliers beyond transS * chi2Qinv(TRANS_Q, 2) from the prior
    trans_m = trans_s * _CHI2_PPF_TRANSQ_2
    norm = jnp.linalg.norm(t, axis=-1, keepdims=True)
    fresh = jax.random.normal(jax.random.fold_in(key, 1),
                              (n_images, n_t, 2)) * trans_s
    t = jnp.where(norm > trans_m, fresh, t)
    state = state._replace(t=t)
    return balance_weight_t(state)


def perturb_d(key: jax.Array, state: ParticleState, pf: float) -> ParticleState:
    noise = jax.random.normal(key, state.d.shape)
    d = state.d + noise * state.s_d[:, None] * pf
    return state._replace(d=d)


# -- proposal balancing (Particle::balanceWeight) -----------------------


def _inv_pdf_weights(pdf: jax.Array) -> jax.Array:
    """Normalized 1/pdf importance weights, guarded against degenerate
    clouds: a fully collapsed support makes the fitted proposal pdf
    overflow float32 (inf) or turn NaN, driving every weight to 0 and
    the normalization to 0/0.  Non-finite weights drop to 0 and an
    all-zero row degrades to UNIFORM — the correct limit for a point
    mass (observed under forced-brick rounds, tests/test_routing.py)."""
    w = 1.0 / jnp.maximum(pdf, 1e-30)
    w = jnp.where(jnp.isfinite(w), w, 0.0)
    tot = jnp.sum(w, axis=-1, keepdims=True)
    uniform = jnp.ones_like(w) / w.shape[-1]
    return jnp.where(tot > 0, w / jnp.maximum(tot, 1e-30), uniform)


def balance_weight_r(state: ParticleState, mode: int) -> ParticleState:
    """w_r = 1 / pdf of the inferred proposal (importance correction)."""
    if mode == MODE_2D:
        mu, k = infer_vms(state.r[..., :2])
        kappa = vms_kappa(k)

        dot = jnp.einsum("lnc,lc->ln", state.r[..., :2], mu)
        # pdfVMS (DirectionalStat.cpp:252-262), gaussian branch for large kappa
        small = jnp.exp(kappa[:, None] * dot) / (
            2 * jnp.pi * jax.scipy.special.i0(jnp.minimum(kappa, 50.0))[:, None]
        )
        dist = jnp.linalg.norm(
            state.r[..., :2] - mu[:, None, :], axis=-1
        )
        sig = jnp.sqrt(1.0 / jnp.maximum(kappa, 1e-6))
        large = jnp.exp(-0.5 * (dist / sig[:, None]) ** 2) / (
            sig[:, None] * jnp.sqrt(2 * jnp.pi)
        )
        pdf = jnp.where(kappa[:, None] < 5.0, small, large)
    else:
        def one(r):
            # closed-form SPD inverse/det: jnp.linalg lowers batched 4x4
            # det/inv to LU custom-calls, a measured hot spot in the
            # phase loop's while body
            a = infer_acg_matrix(r)
            a_inv, det = inv_det4_spd(a)
            quad = jnp.einsum("ni,ij,nj->n", r, a_inv, r)
            pdf = jnp.power(jnp.maximum(det, 1e-30), -0.5) * jnp.power(
                jnp.maximum(quad, 1e-12), -2.0
            )
            # degeneracy guard: a fully collapsed cloud (every support
            # the same rotation, up to quaternion sign) makes A rank-
            # deficient — det underflows to <= 0 and the closed-form
            # inverse returns a garbage (even negative) quadratic form,
            # overflowing pdf to inf and the normalized weights to
            # 0/0 = NaN.  A healthy trace-4 A has quad >= 1/4 for unit
            # quaternions, so quad <= 1e-3 or det <= 1e-30 certifies
            # rank collapse; the whole row degrades to UNIFORM — the
            # correct limit for a point mass.  (A ridge on A was tried
            # first and REJECTED: near-collapsed directions have
            # eigenvalues far below any fixed ridge, so the ridge
            # dominated them and measurably degraded alignment on the
            # 32px CLI probe — corr 0.88 -> 0.77 over 4 seeds.)
            ok = ((det > 1e-30)
                  & jnp.all(quad > 1e-3)
                  & jnp.all(jnp.isfinite(pdf)))
            return jnp.where(ok, pdf, 1.0)

        pdf = jax.vmap(one)(state.r)
    return state._replace(w_r=_inv_pdf_weights(pdf))


def balance_weight_t(state: ParticleState) -> ParticleState:
    """w_t = 1 / bivariate-gaussian pdf fit of the current cloud."""
    m = jnp.mean(state.t, axis=1, keepdims=True)
    s0 = jnp.maximum(jnp.std(state.t[..., 0], axis=1), 1e-6)
    s1 = jnp.maximum(jnp.std(state.t[..., 1], axis=1), 1e-6)
    z = (state.t - m) / jnp.stack([s0, s1], axis=-1)[:, None, :]
    pdf = jnp.exp(-0.5 * jnp.sum(z * z, axis=-1)) / (
        2 * jnp.pi * (s0 * s1)[:, None]
    )
    return state._replace(w_t=_inv_pdf_weights(pdf))


def balance_weight_d(state: ParticleState) -> ParticleState:
    m = jnp.mean(state.d, axis=1, keepdims=True)
    s = jnp.maximum(jnp.std(state.d, axis=1), 1e-6)
    z = (state.d - m) / s[:, None]
    pdf = jnp.exp(-0.5 * z * z) / (s[:, None] * jnp.sqrt(2 * jnp.pi))
    return state._replace(w_d=_inv_pdf_weights(pdf))


# -- peak clipping (Particle.cpp:1893-2002) -----------------------------


def peak_factor(u: jax.Array, base_div: int) -> jax.Array:
    """clip(u_sorted[n/base_div] / u_max, PEAK_FACTOR_MIN, PEAK_FACTOR_MAX)."""
    n = u.shape[-1]
    srt = jnp.sort(u, axis=-1)[..., ::-1]
    ref = srt[..., min(n // base_div, n - 1)]
    top = jnp.maximum(srt[..., 0], 1e-30)
    return jnp.clip(ref / top, PEAK_FACTOR_MIN, PEAK_FACTOR_MAX)


def keep_half_height_peak(u: jax.Array, pk: jax.Array) -> jax.Array:
    """u <- max(u - max(u)*pk, 0) (Particle.cpp keepHalfHeightPeak)."""
    hh = jnp.max(u, axis=-1, keepdims=True) * pk[..., None]
    return jnp.where(u < hh, 0.0, u - hh)


def clip_u_r(state: ParticleState, mode: int) -> ParticleState:
    base = PEAK_FACTOR_BASE if mode == MODE_2D else PEAK_FACTOR_BASE**3
    pk = peak_factor(state.u_r, base)
    return state._replace(u_r=keep_half_height_peak(state.u_r, pk))


def clip_u_t(state: ParticleState) -> ParticleState:
    n_t = state.t.shape[1]
    idx = int(np.floor(n_t * _CHI2_CDF_1_2))
    srt = jnp.sort(state.u_t, axis=-1)[..., ::-1]
    pk = jnp.clip(
        srt[..., min(idx, n_t - 1)] / jnp.maximum(srt[..., 0], 1e-30),
        PEAK_FACTOR_MIN, PEAK_FACTOR_MAX,
    )
    return state._replace(u_t=keep_half_height_peak(state.u_t, pk))


def clip_u_class(w_c: jax.Array) -> jax.Array:
    """Class peak clipping with constant PEAK_FACTOR_C (Config.h:89)."""
    return keep_half_height_peak(w_c, jnp.full(w_c.shape[:-1], PEAK_FACTOR_C))


# -- systematic resampling (Particle::resample, Particle.cpp:1291-1478) --


def systematic_resample(key: jax.Array, support_w: jax.Array,
                        u: jax.Array, n_new: int):
    """Resample indices by the product w * u; returns (idx, new_w).

    support_w: (L, n) prior weights; u: (L, n) likelihoods.
    new_w[j] = 1 / u[idx[j]] (PARTICLE_PRIOR_ONE, Config.h:63), then
    normalized.
    """
    w = support_w * u
    # an all-zero (or non-finite) row would make the cdf normalization
    # 0/0; degrade to uniform — the point-mass limit (_inv_pdf_weights)
    w = jnp.where(jnp.isfinite(w), w, 0.0)
    tot = jnp.sum(w, axis=-1, keepdims=True)
    w = jnp.where(tot > 0, w / jnp.maximum(tot, 1e-30),
                  1.0 / w.shape[-1])
    cdf = jnp.cumsum(w, axis=-1)
    cdf = cdf / cdf[..., -1:]
    u0 = jax.random.uniform(key, w.shape[:-1] + (1,)) / n_new
    pts = u0 + jnp.arange(n_new, dtype=jnp.float32) / n_new
    n = w.shape[-1]
    if n <= 512:
        # searchsorted as a fused compare-and-count: idx[j] = #{k :
        # cdf[k] < pts[j]}.  The batched binary search this replaces is
        # the single most expensive particle-filter op on TPU (measured
        # 9.5 ms/phase at L=512 n=125 vs ~1 ms for this form); the
        # (L, n_new, n) compare fuses into the reduction on the VPU.
        idx = jnp.sum((cdf[..., None, :] < pts[..., :, None])
                      .astype(jnp.int32), axis=-1)
    else:
        # global-scale supports (adopt_global resamples the mS grid):
        # O(n^2) would not fit; keep the binary search
        idx = jax.vmap(jnp.searchsorted)(cdf, pts)
    idx = jnp.minimum(idx, n - 1)
    u_sel = jnp.take_along_axis(u, idx, axis=-1)
    new_w = 1.0 / jnp.maximum(u_sel, 1e-30)
    new_w = new_w / jnp.sum(new_w, axis=-1, keepdims=True)
    return idx, new_w


def resample_r(key: jax.Array, state: ParticleState, n_new: int) -> ParticleState:
    top_idx = jnp.argmax(state.w_r * state.u_r, axis=-1)
    top_r = jnp.take_along_axis(
        state.r, top_idx[:, None, None].repeat(4, axis=-1), axis=1
    )[:, 0]
    idx, new_w = systematic_resample(key, state.w_r, state.u_r, n_new)
    r = jnp.take_along_axis(state.r, idx[..., None].repeat(4, axis=-1), axis=1)
    return state._replace(
        r=r, w_r=new_w, u_r=jnp.ones_like(new_w), top_r=top_r
    )


def resample_t(key: jax.Array, state: ParticleState, n_new: int) -> ParticleState:
    top_idx = jnp.argmax(state.w_t * state.u_t, axis=-1)
    top_t = jnp.take_along_axis(
        state.t, top_idx[:, None, None].repeat(2, axis=-1), axis=1
    )[:, 0]
    idx, new_w = systematic_resample(key, state.w_t, state.u_t, n_new)
    t = jnp.take_along_axis(state.t, idx[..., None].repeat(2, axis=-1), axis=1)
    return state._replace(
        t=t, w_t=new_w, u_t=jnp.ones_like(new_w), top_t=top_t
    )


def resample_d(key: jax.Array, state: ParticleState, n_new: int) -> ParticleState:
    top_idx = jnp.argmax(state.w_d * state.u_d, axis=-1)
    top_d = jnp.take_along_axis(state.d, top_idx[:, None], axis=1)[:, 0]
    idx, new_w = systematic_resample(key, state.w_d, state.u_d, n_new)
    d = jnp.take_along_axis(state.d, idx, axis=-1)
    return state._replace(
        d=d, w_d=new_w, u_d=jnp.ones_like(new_w), top_d=top_d
    )


def draw_poses(key: jax.Array, state: ParticleState, n_draw: int):
    """Uniform draws from the resampled support for reconstruction
    insertion (Particle::rand, Particle.cpp:2109-2191).

    Returns (quat (L, n_draw, 4), trans (L, n_draw, 2), d (L, n_draw)).
    """
    kr, kt, kd = jax.random.split(key, 3)
    n_images = state.r.shape[0]
    ir = jax.random.randint(kr, (n_images, n_draw), 0, state.r.shape[1])
    it = jax.random.randint(kt, (n_images, n_draw), 0, state.t.shape[1])
    idd = jax.random.randint(kd, (n_images, n_draw), 0, state.d.shape[1])
    q = jnp.take_along_axis(state.r, ir[..., None].repeat(4, axis=-1), axis=1)
    t = jnp.take_along_axis(state.t, it[..., None].repeat(2, axis=-1), axis=1)
    d = jnp.take_along_axis(state.d, idd, axis=-1)
    return q, t, d


def _run_ids(v: jax.Array) -> jax.Array:
    """(L, N, C) support values -> (L, N) ids of contiguous equal-value
    runs.  Systematic resampling returns NON-DECREASING ancestor
    indices, so after resample_* every set of bit-identical copies of
    one ancestor is a contiguous run — run identity IS value identity."""
    diff = jnp.any(v[:, 1:] != v[:, :-1], axis=-1)
    return jnp.concatenate(
        [jnp.zeros((v.shape[0], 1), jnp.int32),
         jnp.cumsum(diff.astype(jnp.int32), axis=1)], axis=1)


def draw_poses_compact(key: jax.Array, state: ParticleState, n_draw: int,
                       n_slots: int):
    """draw_poses with exact duplicate merging: the same ``n_draw``
    uniform draws, but value-identical draws are combined into one
    weighted slice.

    The resampled supports hold each surviving pose as bit-identical
    copies (multiplicity = resampling weight), so ``n_draw`` uniform
    draws contain few DISTINCT poses once the filter concentrates —
    measured median 3-27 distinct of 100 draws at 256px local rounds.
    Inserting each distinct pose once with weight count/n_draw is
    mathematically identical to inserting every draw (the reference
    loops over draws only because its insertion is per-slice,
    Reconstructor.cpp:569-866), and the dense-sweep inserter's cost is
    proportional to the slice count — a 2-3x insertion saving.

    When an image has more than ``n_slots`` distinct draws (measured
    ~2% tail of hard images whose clouds rejuvenated), the top
    ``n_slots`` by count are kept and the weights renormalised to
    preserve the image's total inserted weight; the dropped poses are
    the lowest-multiplicity samples of a nearly-flat cloud, the same
    fidelity class as the Monte-Carlo noise of the draws themselves.

    Returns (quat (L, S, 4), trans (L, S, 2), d (L, S), w (L, S)) with
    w summing to 1 per image; slots beyond the distinct count carry
    zero weight (and the top-count pose, so their slices are benign).
    """
    kr, kt, kd = jax.random.split(key, 3)
    n_images = state.r.shape[0]
    ir = jax.random.randint(kr, (n_images, n_draw), 0, state.r.shape[1])
    it = jax.random.randint(kt, (n_images, n_draw), 0, state.t.shape[1])
    idd = jax.random.randint(kd, (n_images, n_draw), 0, state.d.shape[1])

    rid_r = jnp.take_along_axis(_run_ids(state.r), ir, axis=1)
    rid_t = jnp.take_along_axis(_run_ids(state.t), it, axis=1)
    rid_d = jnp.take_along_axis(_run_ids(state.d[..., None]), idd, axis=1)
    n_rt = state.t.shape[1]
    n_rd = state.d.shape[1]
    g = (rid_r * n_rt + rid_t) * n_rd + rid_d            # (L, N)

    order = jnp.argsort(g, axis=1)
    gs = jnp.take_along_axis(g, order, axis=1)
    first = jnp.concatenate(
        [jnp.ones((n_images, 1), bool), gs[:, 1:] != gs[:, :-1]], axis=1)
    uid = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
    rows = jnp.arange(n_images)[:, None]
    counts = jnp.zeros((n_images, n_draw), jnp.float32
                       ).at[rows, uid].add(1.0)
    rep = jnp.full((n_images, n_draw), n_draw, jnp.int32
                   ).at[rows, uid].min(order)            # first draw of run

    cnt_k, pos_k = jax.lax.top_k(counts, n_slots)        # (L, S)
    rep_k = jnp.take_along_axis(rep, pos_k, axis=1)
    rep_k = jnp.minimum(rep_k, n_draw - 1)               # empty slots
    irk = jnp.take_along_axis(ir, rep_k, axis=1)
    itk = jnp.take_along_axis(it, rep_k, axis=1)
    idk = jnp.take_along_axis(idd, rep_k, axis=1)
    q = jnp.take_along_axis(state.r, irk[..., None].repeat(4, -1), axis=1)
    t = jnp.take_along_axis(state.t, itk[..., None].repeat(2, -1), axis=1)
    d = jnp.take_along_axis(state.d, idk, axis=-1)
    w = cnt_k / jnp.maximum(jnp.sum(cnt_k, axis=1, keepdims=True), 1.0)
    return q, t, d, w


def symmetrise_top(state: ParticleState, sym) -> ParticleState:
    """Fold top_r into the asymmetric unit (Particle::symmetrise)."""
    if sym is None or sym.order == 1:
        return state
    return state._replace(top_r=sym.counterpart(state.top_r))
