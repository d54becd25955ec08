import numpy as np
import jax
import jax.numpy as jnp

from thunder_tpu import particle as pt
from thunder_tpu.geometry.quaternion import quat_mul, quat_conj


def _state(key, n_img=4, n_r=64, n_t=32, n_d=1, trans_s=3.0, mode=pt.MODE_3D):
    return pt.init_particles(key, n_img, n_r, n_t, n_d, trans_s, mode)


def test_init_shapes():
    s = _state(jax.random.PRNGKey(0))
    assert s.r.shape == (4, 64, 4)
    assert s.t.shape == (4, 32, 2)
    np.testing.assert_allclose(jnp.linalg.norm(s.r, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(jnp.sum(s.w_r, axis=-1), 1.0, atol=1e-5)


def test_systematic_resample_concentrates():
    key = jax.random.PRNGKey(1)
    s = _state(key)
    # fake likelihood: all mass on support point 7
    u = jnp.zeros((4, 64)).at[:, 7].set(1.0) + 1e-9
    idx, w = pt.systematic_resample(key, s.w_r, u, 64)
    assert (np.asarray(idx) == 7).mean() > 0.95
    np.testing.assert_allclose(jnp.sum(w, axis=-1), 1.0, atol=1e-5)


def test_resample_r_tracks_top():
    key = jax.random.PRNGKey(2)
    s = _state(key)
    target = s.r[:, 5]
    u = jnp.zeros((4, 64)).at[:, 5].set(1.0) + 1e-9
    s = s._replace(u_r=u)
    s2 = pt.resample_r(key, s, 64)
    np.testing.assert_allclose(s2.top_r, target, atol=1e-6)
    # nearly all support points collapse onto the target
    dots = jnp.abs(jnp.einsum("lnq,lq->ln", s2.r, target))
    assert float(jnp.mean(dots > 0.999)) > 0.95


def test_filter_contracts_to_true_pose():
    """Perturb/evaluate/resample cycle against a synthetic peaked
    likelihood must shrink rotation concentration and translation std."""
    key = jax.random.PRNGKey(3)
    n_img, n_r, n_t = 3, 128, 64
    s = pt.init_particles(key, n_img, n_r, n_t, 1, 3.0, pt.MODE_3D)
    true_q = jax.random.normal(jax.random.PRNGKey(9), (n_img, 4))
    true_q = true_q / jnp.linalg.norm(true_q, axis=-1, keepdims=True)
    true_t = jnp.asarray([[1.0, -0.5], [0.0, 2.0], [-1.5, 0.5]])

    def likelihood(s):
        dots = jnp.abs(jnp.einsum("lnq,lq->ln", s.r, true_q))
        u_r = jnp.exp(150 * (dots - 1))
        dist2 = jnp.sum((s.t - true_t[:, None, :]) ** 2, axis=-1)
        u_t = jnp.exp(-dist2 / 0.5)
        return u_r, u_t

    s = pt.cal_vari_r(s, pt.MODE_3D)
    s = pt.cal_vari_t(s)
    for i in range(12):
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        s = pt.perturb_r(k1, s, 0.5, pt.MODE_3D)
        s = pt.perturb_t(k2, s, 0.5, 3.0)
        u_r, u_t = likelihood(s)
        s = s._replace(u_r=u_r, u_t=u_t)
        s = pt.resample_r(k3, s, n_r)
        s = pt.resample_t(k4, s, n_t)
        s = pt.cal_vari_r(s, pt.MODE_3D)
        s = pt.cal_vari_t(s)

    # rank-1 pose close to the truth
    top_dot = jnp.abs(jnp.sum(s.top_r * true_q, axis=-1))
    assert float(jnp.min(top_dot)) > 0.98
    t_err = jnp.linalg.norm(s.top_t - true_t, axis=-1)
    assert float(jnp.max(t_err)) < 0.6
    # concentrations tightened
    assert float(jnp.max(s.k1)) < 0.3
    assert float(jnp.max(s.s0)) < 1.0


def test_peak_clipping():
    u = jnp.asarray([[1.0, 0.6, 0.1, 0.01]])
    pk = jnp.asarray([0.5])
    out = pt.keep_half_height_peak(u, pk)
    np.testing.assert_allclose(out, [[0.5, 0.1, 0.0, 0.0]], atol=1e-6)


def test_cal_score_modes():
    s = _state(jax.random.PRNGKey(4))
    s = s._replace(k1=jnp.full((4,), 0.01), k2=jnp.full((4,), 0.01),
                   k3=jnp.full((4,), 0.01))
    s2 = pt.cal_score(s, pt.MODE_3D)
    np.testing.assert_allclose(s2.score, (0.01**3) ** (-1 / 6), rtol=1e-4)
    s3 = pt.cal_score(s, pt.MODE_2D)
    np.testing.assert_allclose(s3.score, 100.0, rtol=1e-4)


def test_draw_poses_shapes():
    s = _state(jax.random.PRNGKey(5))
    q, t, d = pt.draw_poses(jax.random.PRNGKey(6), s, 10)
    assert q.shape == (4, 10, 4)
    assert t.shape == (4, 10, 2)
    assert d.shape == (4, 10)


def test_from_thu_roundtrip():
    n = 5
    quat = np.tile([1.0, 0, 0, 0], (n, 1))
    trans = np.random.default_rng(0).normal(size=(n, 2))
    std_t = np.full((n, 2), 0.5)
    k123 = np.full((n, 3), 0.05)
    s = pt.from_thu(quat, trans, std_t, k123, np.ones(n), np.full(n, 0.01),
                    16, 8, 1, jax.random.PRNGKey(7), pt.MODE_3D)
    np.testing.assert_allclose(s.top_t, trans, atol=1e-6)
    np.testing.assert_allclose(s.r[:, 0], quat, atol=1e-6)
    # cloud concentrated around the saved pose (ACG k=0.05 -> typical
    # perturbation half-angle ~ sqrt(k), mean |dot| well above uniform)
    dots = jnp.abs(jnp.einsum("lnq,lq->ln", s.r, jnp.asarray(quat, jnp.float32)))
    assert float(jnp.mean(dots)) > 0.7


def test_draw_poses_compact_exact():
    """Compacted draws == plain draws: merging value-identical draws
    into weighted slots preserves the weighted sum of inserted poses
    exactly when the distinct count fits the slot budget."""
    key = jax.random.PRNGKey(11)
    s = _state(key, n_img=5, n_r=64, n_t=32)
    # concentrate the supports the way resampling does: contiguous runs
    # of bit-identical copies of a few ancestors
    u_r = jnp.zeros((5, 64)).at[:, 3].set(1.0).at[:, 9].set(0.5) + 1e-9
    u_t = jnp.zeros((5, 32)).at[:, 1].set(1.0).at[:, 4].set(0.7) + 1e-9
    s = pt.resample_r(key, s._replace(u_r=u_r), 64)
    s = pt.resample_t(key, s._replace(u_t=u_t), 32)

    kd = jax.random.PRNGKey(12)
    n_draw, n_slots = 100, 48
    q0, t0, d0 = pt.draw_poses(kd, s, n_draw)
    q1, t1, d1, w1 = pt.draw_poses_compact(kd, s, n_draw, n_slots)
    assert q1.shape == (5, n_slots, 4) and w1.shape == (5, n_slots)
    np.testing.assert_allclose(np.asarray(w1).sum(1), 1.0, atol=1e-6)
    # weighted "insertion" of an arbitrary pose feature must agree with
    # the plain draws' average (same key => same underlying draws)
    def feat(q, t, d):
        return (np.asarray(q)[..., :, None] * np.asarray(t)[..., None, :]
                ).reshape(q.shape[0], q.shape[1], -1)
    f0 = feat(q0, t0, d0).mean(axis=1)
    f1 = (feat(q1, t1, d1) * np.asarray(w1)[..., None]).sum(axis=1)
    np.testing.assert_allclose(f1, f0, rtol=1e-5, atol=1e-6)


def test_draw_poses_compact_truncates_flat_cloud():
    """With more distinct draws than slots, the kept slots are the
    highest-count ones and the weights renormalise to 1."""
    key = jax.random.PRNGKey(13)
    s = _state(key, n_img=3, n_r=64, n_t=32)   # all-distinct supports
    q1, t1, d1, w1 = pt.draw_poses_compact(
        jax.random.PRNGKey(14), s, 100, 16)
    w = np.asarray(w1)
    np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-6)
    assert (w > 0).all()   # flat cloud: every slot used
