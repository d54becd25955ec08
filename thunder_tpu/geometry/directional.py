"""Directional statistics: Angular Central Gaussian (quaternions) and
von Mises (2D in-plane rotations).

The statistical heart of pose perturbation/compression in the particle
filter (reference src/Geometry/DirectionalStat.cpp).  All functions are
jittable and batch over leading axes (vmap-friendly); the reference's
GSL rejection loops become fixed-round vectorized samplers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from thunder_tpu.geometry.quaternion import quat_normalize

_ACG_TOL = 1e-3
_ACG_MAX_ITER = 64


def sample_acg(key: jax.Array, k1, k2, k3, n: int) -> jax.Array:
    """Sample ``n`` quaternions from ACG with covariance diag(1, k1, k2, k3).

    DirectionalStat.cpp:78-91: draw 4D Gaussian with that (diagonal)
    covariance, normalize to the unit 3-sphere.
    """
    scale = jnp.sqrt(jnp.stack([jnp.ones_like(jnp.asarray(k1, jnp.float32)),
                                jnp.asarray(k1, jnp.float32),
                                jnp.asarray(k2, jnp.float32),
                                jnp.asarray(k3, jnp.float32)], axis=-1))
    v = jax.random.normal(key, (n, 4)) * scale
    return quat_normalize(v)


def _det2(m):
    return m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]


def inv_det4_spd(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Closed-form (inverse, determinant) of a symmetric positive-definite
    4x4 (batched) via 2x2 block Schur complement:
    det(A) = det(P) det(S - Q^T P^{-1} Q).  XLA lowers jnp.linalg.inv /
    det of tiny batched matrices to a slow LU custom-call path on TPU;
    this stays elementwise."""

    def inv2(m, det):
        det = jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
        row0 = jnp.stack([m[..., 1, 1], -m[..., 0, 1]], axis=-1)
        row1 = jnp.stack([-m[..., 1, 0], m[..., 0, 0]], axis=-1)
        return jnp.stack([row0, row1], axis=-2) / det[..., None, None]

    p = a[..., :2, :2]
    qb = a[..., :2, 2:]
    s = a[..., 2:, 2:]
    det_p = _det2(p)
    p_inv = inv2(p, det_p)
    pq = p_inv @ qb                      # P^{-1} Q
    schur = s - jnp.swapaxes(qb, -1, -2) @ pq
    det_s = _det2(schur)
    s_inv = inv2(schur, det_s)
    tl = p_inv + pq @ s_inv @ jnp.swapaxes(pq, -1, -2)
    tr = -pq @ s_inv
    bl = jnp.swapaxes(tr, -1, -2)
    top = jnp.concatenate([tl, tr], axis=-1)
    bot = jnp.concatenate([bl, s_inv], axis=-1)
    return jnp.concatenate([top, bot], axis=-2), det_p * det_s


def _inv4_spd(a: jax.Array) -> jax.Array:
    return inv_det4_spd(a)[0]


def _dominant_eigvec_4(a: jax.Array, n_iter: int = 32) -> jax.Array:
    """Dominant eigenvector of a symmetric PSD 4x4 (batched) by power
    iteration (replaces jnp.linalg.eigh, which lowers to a slow
    tiny-matrix path on TPU).  When the spectrum is near-degenerate any
    top-subspace vector serves equally as the ACG cloud mean."""
    v = a[..., 0, :] + 0.05 * jnp.sum(a, axis=-2) + 1e-6
    for _ in range(n_iter):
        v = jnp.einsum("...ij,...j->...i", a, v)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
    return v


def infer_acg_matrix(q: jax.Array) -> jax.Array:
    """ML estimate of the 4x4 ACG scatter matrix from quaternions (n, 4).

    Fixed-point iteration (DirectionalStat.cpp:93-145):
        B = 4/nf * sum_i (q_i q_i^T) / (q_i^T A^{-1} q_i),  nf = sum_i 1/u_i
    iterated until sum|A - B| < 1e-3.  Implemented as a bounded
    while_loop so it stays jit/vmap-compatible.
    """
    n = q.shape[-2]
    eye = jnp.eye(4, dtype=q.dtype)

    def step(a):
        u = jnp.einsum("...ni,...ij,...nj->...n", q, _inv4_spd(a), q)
        u = jnp.maximum(u, 1e-12)
        b = 4.0 * jnp.einsum("...ni,...nj,...n->...ij", q, q, 1.0 / u)
        nf = jnp.sum(1.0 / u, axis=-1)
        return b / nf[..., None, None]

    def cond(state):
        a, b, it = state
        diff = jnp.sum(jnp.abs(a - b))
        return jnp.logical_and(diff > _ACG_TOL, it < _ACG_MAX_ITER)

    def body(state):
        _, b, it = state
        return b, step(b), it + 1

    a0 = eye * jnp.ones(q.shape[:-2] + (1, 1), dtype=q.dtype)
    state = (a0, step(a0), jnp.zeros((), jnp.int32))
    a, _, _ = jax.lax.while_loop(cond, body, state)
    del n
    return a


def infer_acg_k123(q: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(k1, k2, k3) = (A11, A22, A33) / A00 (DirectionalStat.cpp:184-208)."""
    a = infer_acg_matrix(q)
    a00 = jnp.maximum(a[..., 0, 0], 1e-12)
    return a[..., 1, 1] / a00, a[..., 2, 2] / a00, a[..., 3, 3] / a00


def infer_acg_mean(q: jax.Array) -> jax.Array:
    """Dominant eigenvector of the ACG matrix (DirectionalStat.cpp:224-249)."""
    a = infer_acg_matrix(q)
    return quat_normalize(_dominant_eigvec_4(a))


def vms_kappa(k: jax.Array) -> jax.Array:
    """Map the framework's compression parameter k in (0, 1] to the von
    Mises concentration kappa (DirectionalStat.cpp:256)."""
    k = jnp.clip(k, 1e-6, 1.0)
    return (1 - k) * (1 + 2 * k - k * k) / k / (2 - k)


def sample_vms(key: jax.Array, mu: jax.Array, k: jax.Array, n: int,
               n_rounds: int = 8) -> jax.Array:
    """Sample ``n`` unit 2-vectors from von Mises centered at ``mu``.

    Best-Fisher rejection (DirectionalStat.cpp:264-318) vectorized with a
    fixed number of proposal rounds; un-accepted lanes (probability
    ~ reject_rate^n_rounds, negligible) fall back to the mode.  For very
    small kappa the distribution is uniform on the circle.
    """
    kappa = vms_kappa(k)
    ku, kz, kflip = jax.random.split(key, 3)

    # Best-Fisher proposal parameters
    kap = jnp.maximum(kappa, 1e-6)
    a = 1 + jnp.sqrt(1 + 4 * kap * kap)
    b = (a - jnp.sqrt(2 * a)) / (2 * kap)
    r = (1 + b * b) / (2 * b)

    z = jnp.cos(jnp.pi * jax.random.uniform(kz, (n_rounds, n)))
    f = (1 + r * z) / (r + z)
    c = kap * (r - f)
    u2 = jax.random.uniform(ku, (n_rounds, n), minval=1e-12)
    accept = jnp.logical_or(c * (2 - c) > u2, jnp.log(c / u2) + 1 - c >= 0)
    # first accepted round per lane
    first = jnp.argmax(accept, axis=0)
    any_acc = jnp.any(accept, axis=0)
    f_sel = jnp.where(any_acc, jnp.take_along_axis(f, first[None], axis=0)[0], 1.0)

    delta = jnp.sqrt(jnp.maximum(0.0, (1 - f_sel) * (1 + f_sel)))
    sign = jnp.where(jax.random.uniform(kflip, (n,)) > 0.5, 1.0, -1.0)
    x = mu[0] * f_sel + sign * delta * mu[1]
    y = mu[1] * f_sel - sign * delta * mu[0]
    out = jnp.stack([x, y], axis=-1)

    # uniform-on-circle branch for tiny kappa (DirectionalStat.cpp:273)
    phi = jax.random.uniform(kz, (n,), minval=0.0, maxval=2 * jnp.pi)
    uniform = jnp.stack([jnp.cos(phi), jnp.sin(phi)], axis=-1)
    return jnp.where(kappa < 1e-1, uniform, out)


def infer_vms(v: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Mean direction and compression k = 1 - R from unit 2-vectors
    (..., n, 2) (DirectionalStat.cpp:334-357)."""
    s = jnp.sum(v, axis=-2)
    norm = jnp.linalg.norm(s, axis=-1)
    big_r = norm / v.shape[-2]
    mu = s / jnp.maximum(norm, 1e-12)[..., None]
    return mu, 1 - big_r
