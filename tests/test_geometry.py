import numpy as np
import jax
import jax.numpy as jnp
import pytest

from thunder_tpu.geometry import (
    quat_mul,
    quat_conj,
    rotate2d,
    rotate3d,
    quat_from_axis_angle,
    quat_from_matrix,
    quat_from_euler,
    euler_from_quat,
    random_quat,
    Symmetry,
)
from thunder_tpu.geometry.quaternion import quat_rotate
from thunder_tpu.geometry.directional import (
    sample_acg,
    infer_acg_k123,
    infer_acg_mean,
    sample_vms,
    infer_vms,
)


def test_quat_mul_identity():
    q = random_quat(jax.random.PRNGKey(1), (5,))
    e = jnp.asarray([1.0, 0, 0, 0])
    np.testing.assert_allclose(quat_mul(q, jnp.broadcast_to(e, q.shape)), q, atol=1e-6)
    np.testing.assert_allclose(
        quat_mul(q, quat_conj(q)),
        jnp.broadcast_to(e, q.shape),
        atol=1e-6,
    )


def test_rotate3d_orthonormal():
    q = random_quat(jax.random.PRNGKey(2), (10,))
    r = rotate3d(q)
    eye = jnp.broadcast_to(jnp.eye(3), r.shape)
    np.testing.assert_allclose(r @ jnp.swapaxes(r, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.det(r), jnp.ones(10), atol=1e-5)


def test_rotate3d_matches_axis_angle():
    # rotation about z by phi must equal the 2D rotation embedded in 3D
    phi = 0.7
    q = quat_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(phi))
    r3 = rotate3d(q)
    r2 = rotate2d(jnp.asarray(phi))
    np.testing.assert_allclose(r3[:2, :2], r2, atol=1e-6)
    np.testing.assert_allclose(r3[2, 2], 1.0, atol=1e-6)


def test_quat_matrix_roundtrip():
    q = random_quat(jax.random.PRNGKey(3), (20,))
    # canonicalize sign (q and -q are the same rotation)
    q = q * jnp.sign(q[..., :1])
    q2 = quat_from_matrix(rotate3d(q))
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_quat_rotate_agrees_with_matrix():
    q = random_quat(jax.random.PRNGKey(4), (7,))
    v = jax.random.normal(jax.random.PRNGKey(5), (7, 3))
    np.testing.assert_allclose(
        quat_rotate(q, v),
        jnp.einsum("nij,nj->ni", rotate3d(q), v),
        atol=1e-5,
    )


def test_euler_roundtrip():
    phi, theta, psi = 1.1, 0.6, 2.5
    q = quat_from_euler(jnp.asarray(phi), jnp.asarray(theta), jnp.asarray(psi))
    p2, t2, s2 = euler_from_quat(q)
    np.testing.assert_allclose([p2, t2, s2], [phi, theta, psi], atol=1e-5)


@pytest.mark.parametrize(
    "name,order",
    [("C1", 1), ("C4", 4), ("D2", 4), ("D7", 14), ("T", 12), ("O", 24), ("I1", 60)],
)
def test_symmetry_group_order(name, order):
    sym = Symmetry(name)
    assert sym.order == order
    assert sym.n_elements == order - 1
    # closure: every product of two elements is in the group
    mats = np.asarray(sym.matrices, dtype=np.float64)
    prod = mats[1] @ mats[-1] if order > 1 else mats[0]
    dists = np.abs(mats - prod).reshape(order, -1).max(axis=1)
    assert dists.min() < 1e-4


def test_symmetry_counterpart_identity_group():
    sym = Symmetry("C1")
    q = random_quat(jax.random.PRNGKey(6), (4,))
    np.testing.assert_allclose(sym.counterpart(q), q)


def test_symmetry_counterpart_c4_folds():
    sym = Symmetry("C4")
    q = random_quat(jax.random.PRNGKey(7), (32,))
    folded = sym.counterpart(q)
    # folding maximizes |w| over symmetric equivalents
    w_folded = jnp.abs(folded[..., 0])
    for s in np.asarray(sym.quats):
        alt = quat_mul(quat_conj(jnp.asarray(s)), q)
        assert bool(jnp.all(w_folded >= jnp.abs(alt[..., 0]) - 1e-6))


def test_acg_inference_roundtrip():
    # sample from a concentrated ACG, infer k's back
    k1 = k2 = k3 = 0.01
    q = sample_acg(jax.random.PRNGKey(8), k1, k2, k3, 4000)
    e1, e2, e3 = infer_acg_k123(q)
    for e in (e1, e2, e3):
        assert 0.003 < float(e) < 0.03


def test_acg_mean_recovers_mode():
    # perturb around a known rotation and check the inferred mean
    base = random_quat(jax.random.PRNGKey(9))
    d = sample_acg(jax.random.PRNGKey(10), 0.005, 0.005, 0.005, 2000)
    q = quat_mul(d, jnp.broadcast_to(base, d.shape))
    mean = infer_acg_mean(q)
    dot = jnp.abs(jnp.sum(mean * base))
    assert float(dot) > 0.995


def test_vms_inference_roundtrip():
    mu = jnp.asarray([np.cos(0.8), np.sin(0.8)], dtype=jnp.float32)
    v = sample_vms(jax.random.PRNGKey(11), mu, jnp.asarray(0.05), 4000)
    mu2, k2 = infer_vms(v)
    assert float(jnp.sum(mu2 * mu)) > 0.99
    assert 0.01 < float(k2) < 0.15


def test_vms_small_kappa_uniform():
    mu = jnp.asarray([1.0, 0.0])
    v = sample_vms(jax.random.PRNGKey(12), mu, jnp.asarray(0.999), 4000)
    _, k = infer_vms(v)
    assert float(k) > 0.8  # nearly uniform


def test_dominant_eigvec_matches_eigh():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from thunder_tpu.geometry.directional import _dominant_eigvec_4, _inv4_spd

    rng = np.random.default_rng(3)
    for _ in range(20):
        m = rng.normal(size=(4, 4))
        a = m @ m.T + 0.1 * np.eye(4)
        v = np.asarray(_dominant_eigvec_4(jnp.asarray(a, jnp.float32)))
        w, vecs = np.linalg.eigh(a)
        ref = vecs[:, -1]
        assert abs(abs(v @ ref) - 1.0) < 1e-3
        inv = np.asarray(_inv4_spd(jnp.asarray(a, jnp.float32)))
        assert np.allclose(inv @ a, np.eye(4), atol=1e-3)
