"""Multi-host bring-up helpers (parallel/distributed.py) — the
reference's process-topology setup (src/Parallel.cpp:17-67) mapped to
jax.distributed + a global mesh."""

import numpy as np
import jax


def test_default_mesh_hemi_data():
    from thunder_tpu.parallel.distributed import default_mesh

    mesh = default_mesh()
    # conftest forces 8 virtual devices: full (hemi=2, data=4) topology
    assert dict(mesh.shape) == {"hemi": 2, "data": 4}
    assert mesh.devices.shape == (2, 4)


def test_default_mesh_data_only_fallback():
    from jax.sharding import Mesh

    from thunder_tpu.parallel.distributed import default_mesh

    # an odd hemi count that does not divide the device count falls
    # back to a flat data mesh
    mesh = default_mesh(hemi=3)
    assert dict(mesh.shape) == {"hemi": 3, "data": 2} or \
        list(mesh.axis_names) == ["data"]


def test_init_multihost_single_host_noop():
    from thunder_tpu.parallel.distributed import init_multihost

    # single-host: must not call jax.distributed.initialize and must
    # report the visible device count
    n = init_multihost()
    assert n == len(jax.devices()) == 8


def test_init_multihost_passes_through(monkeypatch):
    from thunder_tpu.parallel import distributed

    calls = {}

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None):
        calls.update(addr=coordinator_address, n=num_processes,
                     pid=process_id)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    n = distributed.init_multihost("10.0.0.1:1234", 4, 2)
    assert calls == {"addr": "10.0.0.1:1234", "n": 4, "pid": 2}
    assert n == len(jax.devices())
