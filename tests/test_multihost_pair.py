"""Real two-process multi-host bring-up: two OS processes join via
jax.distributed (CPU backend, 2 virtual devices each), build the
production (hemi, data) mesh over all 4 global devices, and run a
psum-over-data collective on process-local shards — the topology the
reference wires with MPI communicators (src/Parallel.cpp:17-67),
exercised end-to-end instead of monkeypatched."""

import os
import socket
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import sys

    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    pid, port = int(sys.argv[1]), sys.argv[2]
    sys.path.insert(0, %r)

    from thunder_tpu.parallel.distributed import default_mesh, init_multihost

    n = init_multihost(f"localhost:{port}", 2, pid)
    assert n == 4, f"expected 4 global devices, got {n}"
    assert jax.process_index() == pid

    mesh = default_mesh()
    assert dict(mesh.shape) == {"hemi": 2, "data": 2}, dict(mesh.shape)

    from jax.sharding import NamedSharding, PartitionSpec as P

    # each PROCESS contributes only its local rows (per-host sharded
    # ingest contract).  With contiguous process devices the (hemi,
    # data) mesh assigns one full hemisphere per process — exactly the
    # reference's rank topology (odd ranks = A, even = B)
    sharding = NamedSharding(mesh, P("hemi", "data"))
    local = np.full((1, 4), float(pid + 1), np.float32)
    arr = jax.make_array_from_process_local_data(sharding, local, (2, 4))

    @jax.jit
    def total(a):
        return a.sum()

    s = float(total(arr))
    # process 0 contributes 4 ones, process 1 four twos
    assert s == 12.0, s
    if pid == 0:
        print("MULTIHOST_PAIR_OK", s, flush=True)
""" % REPO)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_psum(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(pid), str(port)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-2000:]}"
    assert any("MULTIHOST_PAIR_OK" in out for _, out, _ in outs)
