"""The hot likelihood kernel, MXU-style.

Reference semantics (Optimiser.cpp:9187-10263 scalar/AVX kernels and
gpu/src/Kernel.cu kernel_logDataVS*):

    dvp[pose] = sum_px |dat - ctf * tra * pri|^2 * sigRcp,
    sigRcp = -0.5 / sigma^2   (Optimiser.cpp:5242)

so dvp is a log-likelihood (higher = better) and pose weights are
softmax(dvp) with a streaming baseline.

TPU re-design: expand the square.  With s = sigRcp,

    dvp[l,m,n] = A[l] + B[l,m] + C[l,n,m]
    A[l]     = sum_px s |dat|^2                      (pose-independent)
    B[l,m]   = sum_px (s ctf^2)[l] |pri[m]|^2        -> matmul (L,P)@(P,M)
    C[l,n,m] = -2 Re sum_px (s ctf dat conj(tra[n]))[l] conj(pri[m])
             -> one real matmul (L*N, 2P) @ (2P, M)

The whole global-search pose grid therefore runs as large MXU
contractions instead of the reference's hand-vectorized pixel loops; a
flash-attention-style scan over rotation blocks keeps the running
log-sum-exp baseline and the wC/wR/wT marginals without materializing
the full (L, M, N) tensor (Optimiser.cpp:827-897's streaming baseline).

Kernel-strategy note: a hand-written Pallas/Mosaic likelihood kernel
was evaluated on the real chip and REMOVED in round 2 — it compiled but
ran ~20x slower than this XLA einsum path (737 ms vs 38 ms at
L=64,M=128,N=8,P=512; Mosaic's scheduling on v5e lost to XLA's fused
MXU contraction), and Mosaic's dynamic-gather lowering is broken beyond
one (8,128) tile on this toolchain.  The TPU-native kernel wins live in
the data layout instead: corner-row projection tables (ops/projector.py)
and the scatter-free shear-sweep insertion (ops/insert.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# MXU passes for the likelihood contractions.  HIGH = bf16x3, which
# carries f32-class accuracy at half the MXU passes of HIGHEST (6x
# bf16) — measured ~2x on the C-term matmul at 256px with dvp parity
# to ~1e-5 relative.  THUNDER_MXU_PRECISION=highest restores the
# 6-pass path for A/B checks.
_PREC = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}[os.environ.get("THUNDER_MXU_PRECISION", "high").lower()]


def _split_ri(z: jax.Array) -> jax.Array:
    """(..., p) complex -> (..., 2p) float32 [re | im]."""
    return jnp.concatenate([jnp.real(z), jnp.imag(z)], axis=-1).astype(jnp.float32)


def log_dvp_block(dat_w: jax.Array, sctf2: jax.Array, pri: jax.Array,
                  tra: jax.Array, a_term: jax.Array) -> jax.Array:
    """Log-likelihood for a (rotation-block x translation) pose grid.

    dat_w : (l, p) complex  = s * ctf * dat        (precomputed per round)
    sctf2 : (l, p) float    = s * ctf^2
    pri   : (m, p) complex   projected slices for this rotation block
    tra   : (n, p) complex   translation phase ramps
    a_term: (l,)   float    = sum_px s |dat|^2

    Returns dvp: (l, m, n) float32.
    """
    pri_ri = _split_ri(pri)                                   # (m, 2p)
    b = jnp.einsum("lp,mp->lm", sctf2, jnp.abs(pri) ** 2, precision=_PREC)

    # X[l,n,p] = dat_w * conj(tra);  C = -2 Re(X conj(pri))
    x = dat_w[:, None, :] * jnp.conj(tra)[None, :, :]         # (l, n, p)
    x_ri = _split_ri(x)                                       # (l, n, 2p)
    c = -2.0 * jnp.einsum("lnq,mq->lmn", x_ri, pri_ri, precision=_PREC)
    return a_term[:, None, None] + b[:, :, None] + c


def log_dvp_local(dat_w: jax.Array, sctf2: jax.Array, pri: jax.Array,
                  tra: jax.Array, a_term: jax.Array) -> jax.Array:
    """Per-image local-search likelihood over each image's own support.

    dat_w : (l, p) complex = s * ctf * dat
    sctf2 : (l, p) float
    pri   : (l, r, p) complex  (per-image rotations)
    tra   : (l, t, p) complex  (per-image translations)
    Returns dvp: (l, r, t) float32 — batched MXU matmuls over l.
    """
    b = jnp.einsum("lp,lrp->lr", sctf2, jnp.abs(pri) ** 2, precision=_PREC)
    x = dat_w[:, None, :] * jnp.conj(tra)                     # (l, t, p)
    x_ri = _split_ri(x)
    pri_ri = _split_ri(pri)
    c = -2.0 * jnp.einsum("ltq,lrq->lrt", x_ri, pri_ri, precision=_PREC)
    return a_term[:, None, None] + b[:, :, None] + c


def log_dvp_local_ctf(dat_s: jax.Array, s_pack: jax.Array, ctf_d: jax.Array,
                      pri: jax.Array, tra: jax.Array,
                      a_term: jax.Array) -> jax.Array:
    """Local search with defocus refinement: per-support-point CTFs.

    dat_s : (l, p) complex = s * dat
    s_pack: (l, p) float   = sigRcp
    ctf_d : (l, d, p) float  per-defocus-support CTFs (ctf_packed_scaled)
    pri   : (l, r, p) complex;  tra: (l, t, p) complex
    Returns dvp: (l, d, r, t) float32.
    """
    b = jnp.einsum("lp,ldp,lrp->ldr", s_pack, ctf_d**2, jnp.abs(pri) ** 2,
                   precision=_PREC)
    x = dat_s[:, None, :] * jnp.conj(tra)                     # (l, t, p)
    # C[l,d,r,t] = -2 Re sum_p ctf_d[l,d,p] x[l,t,p] conj(pri[l,r,p])
    xc = x[:, None, :, :] * ctf_d[:, :, None, :]              # (l, d, t, p)
    x_ri = _split_ri(xc)
    pri_ri = _split_ri(pri)
    c = -2.0 * jnp.einsum("ldtq,lrq->ldrt", x_ri, pri_ri, precision=_PREC)
    return a_term[:, None, None, None] + b[..., None] + c
