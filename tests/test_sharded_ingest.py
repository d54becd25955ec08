"""Per-host sharded ingest (parallel/ingest.py): two real processes,
each loading ONLY the global rows its mesh devices address (the
reference's per-rank chunk assignment, Database.cpp:207-254,621), then
one full production E-M round over the joint mesh."""

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

    from thunder_tpu.config import ThunderConfig
    from thunder_tpu.optimiser import Optimiser
    from thunder_tpu.parallel.distributed import default_mesh, init_multihost
    from thunder_tpu.physics.ctf import ctf_params
    from thunder_tpu.physics.mask import radial_grid

    init_multihost(f"localhost:{port}", 2, pid)
    mesh = default_mesh()
    assert dict(mesh.shape) == {"hemi": 2, "data": 2}, dict(mesh.shape)

    size, n = 16, 8
    rng = np.random.default_rng(0)  # same data derivable on every host
    u = np.asarray(radial_grid(size, 3))
    vol = np.exp(-((u / 3.0) ** 2)).astype(np.float32)
    imgs = rng.standard_normal((n, size, size)).astype(np.float32)
    requested = []

    def loader(ids):
        requested.extend(int(i) for i in ids)
        return imgs[np.asarray(ids)]

    cfg = ThunderConfig(
        mode="3D", k=1, size=size, pixel_size=1.0, mask_radius=6.0,
        trans_s=1.0, init_res=3.0, global_search_res=2.5, sym="C1",
        m_s=16, m_l_r=4, m_l_t=4, m_reco=2, ignore_res=16.0,
        trans_search_factor=0.2,
    )
    ctf = ctf_params(np.full(n, 300e3), np.full(n, 800.0),
                     np.full(n, 800.0), np.zeros(n), np.full(n, 2e7),
                     np.full(n, 0.1), np.zeros(n))
    opt = Optimiser(cfg, None, ctf, np.zeros(n, np.int64), init_refs=vol,
                    mesh=mesh, image_loader=loader)

    # each process loaded exactly ONE hemisphere's rows (n/2), and only
    # ids belonging to that hemisphere
    assert opt.n_local_loaded == n // 2, opt.n_local_loaded
    h = opt.local_rows[0].start
    assert set(requested) <= set(opt.index[h].tolist()), (requested, h)

    with mesh:
        rec = opt.run_round(0)
    refs = opt._host(opt.state.refs)
    assert np.all(np.isfinite(refs)), "non-finite refs"
    if pid == 0:
        print("SHARDED_INGEST_OK", rec["res_A"], flush=True)
""" % REPO)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_ingest_round(tmp_path):
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
        out, err = p.communicate(timeout=900)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-3000:]}"
    assert any("SHARDED_INGEST_OK" in out for _, out, _ in outs)
