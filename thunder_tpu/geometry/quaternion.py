"""Quaternion / rotation algebra, batched over leading axes.

Conventions match the reference (src/Geometry/Euler.cpp):
  * quaternions are (w, x, y, z), unit norm;
  * ``rotate3d(q)`` returns R = I + 2w[A] + 2[A]^2 with [A] = skew(x,y,z)
    (Euler.cpp:181-189), i.e. the matrix that rotates a column vector by q;
  * Euler angles (phi, theta, psi) follow the reference's ZYZ convention
    (Euler.cpp:91-100): q = (cos((phi+psi)/2)cos(theta/2), ...).

Everything is jittable and vmapped over arbitrary leading batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b; inputs (..., 4). Euler.cpp:13-26."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    """Conjugate (= inverse for unit quaternions)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jax.Array, eps: float = 1e-30) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def rotate2d(phi: jax.Array) -> jax.Array:
    """(...,) angle -> (..., 2, 2) CCW rotation matrix (Euler.cpp:133-143)."""
    c, s = jnp.cos(phi), jnp.sin(phi)
    row0 = jnp.stack([c, -s], axis=-1)
    row1 = jnp.stack([s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def rotate2d_from_unit(v: jax.Array) -> jax.Array:
    """(..., 2) unit vector (cos, sin) -> (..., 2, 2) matrix (Euler.cpp:125)."""
    c, s = v[..., 0], v[..., 1]
    row0 = jnp.stack([c, -s], axis=-1)
    row1 = jnp.stack([s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def rotate3d(q: jax.Array) -> jax.Array:
    """(..., 4) unit quaternion -> (..., 3, 3) rotation matrix.

    R = I + 2w[A] + 2[A]^2 (Euler.cpp:181-189).
    """
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r00 = 1 - 2 * (yy + zz)
    r01 = 2 * (xy - wz)
    r02 = 2 * (xz + wy)
    r10 = 2 * (xy + wz)
    r11 = 1 - 2 * (xx + zz)
    r12 = 2 * (yz - wx)
    r20 = 2 * (xz - wy)
    r21 = 2 * (yz + wx)
    r22 = 1 - 2 * (xx + yy)
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_from_axis_angle(axis: jax.Array, phi: jax.Array) -> jax.Array:
    """Unit axis (..., 3) + angle (...,) -> quaternion (Euler.cpp:102-109)."""
    half = phi / 2
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], s[..., None] * axis], axis=-1
    )


def quat_from_matrix(m: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> quaternion (Euler.cpp:112-122).

    Shepperd-style with copysign; numerically fine away from w ~ 0 traces,
    which is all the framework needs (it mostly goes matrix -> never back).
    """
    t = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    w = 0.5 * jnp.sqrt(jnp.maximum(0.0, 1 + t))
    x = 0.5 * jnp.sqrt(jnp.maximum(0.0, 1 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2]))
    y = 0.5 * jnp.sqrt(jnp.maximum(0.0, 1 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2]))
    z = 0.5 * jnp.sqrt(jnp.maximum(0.0, 1 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2]))
    x = jnp.copysign(x, m[..., 2, 1] - m[..., 1, 2])
    y = jnp.copysign(y, m[..., 0, 2] - m[..., 2, 0])
    z = jnp.copysign(z, m[..., 1, 0] - m[..., 0, 1])
    return jnp.stack([w, x, y, z], axis=-1)


def quat_from_euler(phi: jax.Array, theta: jax.Array, psi: jax.Array) -> jax.Array:
    """ZYZ Euler -> quaternion (Euler.cpp:91-100)."""
    return jnp.stack(
        [
            jnp.cos((phi + psi) / 2) * jnp.cos(theta / 2),
            jnp.cos((phi - psi) / 2) * jnp.sin(theta / 2),
            jnp.sin((phi - psi) / 2) * jnp.sin(theta / 2),
            jnp.sin((phi + psi) / 2) * jnp.cos(theta / 2),
        ],
        axis=-1,
    )


def euler_from_quat(q: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Quaternion -> (phi, theta, psi) in [0, 2pi) (Euler.cpp:70-88)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    phi = jnp.arctan2(x * z + w * y, w * x - y * z)
    phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
    theta = jnp.arccos(jnp.clip(w * w - x * x - y * y + z * z, -1.0, 1.0))
    psi = jnp.arctan2(x * z - w * y, w * x + y * z)
    psi = jnp.where(psi < 0, psi + 2 * jnp.pi, psi)
    return phi, theta, psi


def random_quat(key: jax.Array, shape: tuple = ()) -> jax.Array:
    """Uniform random rotations: normalized 4D Gaussians."""
    v = jax.random.normal(key, shape + (4,))
    return quat_normalize(v)


def random_unit2d(key: jax.Array, shape: tuple = ()) -> jax.Array:
    """Uniform random points on the unit circle, as (cos, sin) pairs."""
    phi = jax.random.uniform(key, shape, minval=0.0, maxval=2 * jnp.pi)
    return jnp.stack([jnp.cos(phi), jnp.sin(phi)], axis=-1)


def swing_twist(q: jax.Array, axis: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Decompose q = swing * twist with twist a rotation about ``axis``.

    Mirrors Euler.cpp swingTwist: twist = normalize((w, proj of (x,y,z)
    on axis)), swing = q * conj(twist).
    """
    w = q[..., :1]
    v = q[..., 1:]
    proj = jnp.sum(v * axis, axis=-1, keepdims=True) * axis
    twist = quat_normalize(jnp.concatenate([w, proj], axis=-1))
    swing = quat_mul(q, quat_conj(twist))
    return swing, twist


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors (..., 3) by quaternions (..., 4)."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)
