"""The production Optimiser on a data-sharded mesh must match the
single-device run (layout-only change; XLA inserts the collectives)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh


@pytest.mark.slow
def test_optimiser_data_mesh_consistency():
    import sys
    sys.path.insert(0, "tests")
    from test_e2e_2d import make_dataset
    from thunder_tpu.config import ThunderConfig
    from thunder_tpu.optimiser import Optimiser
    from thunder_tpu.physics.ctf import ctf_params

    size, n = 32, 32  # 16 per hemisphere, divisible by 4 devices
    imgs, _ = make_dataset(size, n)
    cfg = ThunderConfig(
        mode="2D", k=2, size=size, pixel_size=1.0, mask_radius=12.0,
        trans_s=2.0, init_res=8.0, global_search_res=4.0, sym="C1",
        m_s_2d=32, m_l_r_2d=9, m_l_t=9, m_reco=8,
        ignore_res=size * 1.0, trans_search_factor=0.25,
    )
    ctf = ctf_params(
        np.full(n, 300e3), np.full(n, 2000.0), np.full(n, 2000.0),
        np.zeros(n), np.zeros(n), np.full(n, 0.1), np.zeros(n),
    )

    opt1 = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64))
    opt1.run_round(0)

    mesh = Mesh(np.asarray(jax.devices()[:4]), axis_names=("data",))
    opt2 = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64), mesh=mesh)
    with mesh:
        opt2.run_round(0)

    np.testing.assert_allclose(
        np.asarray(opt1.state[0].refs), np.asarray(opt2.state[0].refs),
        rtol=5e-2, atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(opt1.state[0].cls), np.asarray(opt2.state[0].cls)
    )
    # FSC shells near zero are reassociation-sensitive (psum order);
    # require agreement only where the correlation is meaningful
    strong = np.abs(opt1.model.fsc) > 0.5
    np.testing.assert_allclose(
        opt1.model.fsc[strong], opt2.model.fsc[strong], rtol=5e-2, atol=2e-2
    )
