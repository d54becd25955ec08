"""Reference auto-recentring (the O-accumulator path)."""

import numpy as np
import jax.numpy as jnp

from thunder_tpu.optimiser import _recentre_refs


def test_recentre_shifts_by_minus_o():
    size = 32
    c = size // 2
    k = np.arange(size) - c
    ky, kx = np.meshgrid(k, k, indexing="ij")
    # blob sitting at +3 in x: mean rank-1 translation would be ~(3, 0)
    blob = np.exp(-(((kx - 3) ** 2 + ky**2) / (2 * 2.0**2))).astype(np.float32)
    refs = jnp.asarray(np.fft.ifftshift(blob))[None]

    out = np.asarray(_recentre_refs(refs, jnp.asarray([[3.0, 0.0]]), True))[0]
    out_c = np.fft.fftshift(out)
    # the blob should now peak at the box center
    peak = np.unravel_index(np.argmax(out_c), out_c.shape)
    assert abs(peak[1] - c) <= 1 and abs(peak[0] - c) <= 1, peak
