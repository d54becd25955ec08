"""Pallas fused likelihood kernel vs the XLA einsum reference
(interpret mode on CPU; compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from thunder_tpu.ops.likelihood import log_dvp_block
from thunder_tpu.ops.pallas_likelihood import log_dvp_block_pallas


def test_pallas_matches_xla():
    rng = np.random.default_rng(0)
    L, M, N, P = 5, 7, 3, 200
    dat_w = (rng.normal(size=(L, P)) + 1j * rng.normal(size=(L, P))).astype(np.complex64)
    sctf2 = -np.abs(rng.normal(size=(L, P))).astype(np.float32)
    pri = (rng.normal(size=(M, P)) + 1j * rng.normal(size=(M, P))).astype(np.complex64)
    tra = np.exp(1j * rng.uniform(0, 2 * np.pi, size=(N, P))).astype(np.complex64)
    a_term = rng.normal(size=L).astype(np.float32)

    want = np.asarray(
        log_dvp_block(jnp.asarray(dat_w), jnp.asarray(sctf2),
                      jnp.asarray(pri), jnp.asarray(tra), jnp.asarray(a_term))
    )
    got = np.asarray(
        log_dvp_block_pallas(
            jnp.asarray(dat_w), jnp.asarray(sctf2), jnp.asarray(pri),
            jnp.asarray(tra), jnp.asarray(a_term),
            block_l=8, block_m=8, block_p=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_pallas_p_accumulation():
    """Multiple P slabs must accumulate, not overwrite."""
    rng = np.random.default_rng(1)
    L, M, N, P = 4, 4, 2, 300  # 300 -> 3 slabs of 128 (padded)
    dat_w = (rng.normal(size=(L, P)) + 1j * rng.normal(size=(L, P))).astype(np.complex64)
    sctf2 = -np.abs(rng.normal(size=(L, P))).astype(np.float32)
    pri = (rng.normal(size=(M, P)) + 1j * rng.normal(size=(M, P))).astype(np.complex64)
    tra = np.exp(1j * rng.uniform(0, 2 * np.pi, size=(N, P))).astype(np.complex64)
    a_term = np.zeros(L, np.float32)

    want = np.asarray(
        log_dvp_block(jnp.asarray(dat_w), jnp.asarray(sctf2),
                      jnp.asarray(pri), jnp.asarray(tra), jnp.asarray(a_term))
    )
    got = np.asarray(
        log_dvp_block_pallas(
            jnp.asarray(dat_w), jnp.asarray(sctf2), jnp.asarray(pri),
            jnp.asarray(tra), jnp.asarray(a_term),
            block_l=8, block_m=8, block_p=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
