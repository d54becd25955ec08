"""Capture a device trace of one hot E-M round and print the top ops
by self time (parsed from the xplane proto with xprof).

    python scripts/trace_round.py [size] [n]
"""

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/thunder_trace"


def parse_xplane(trace_dir):
    """Sum device-op self-times from the xplane proto."""
    from xprof.convert import _pywrap_profiler_plugin as pp  # noqa
    # fall back to raw proto parsing: the plugin API varies across
    # versions, so read the xplane directly
    from tensorboard_plugin_profile.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xspace.ParseFromString(f.read())

    out = {}
    total = 0
    for plane in xspace.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            lname = line.name.lower()
            if "step" in lname or "xla modules" in lname:
                continue  # avoid double counting module-level lines
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e12
                out[name] = out.get(name, 0.0) + dur
                total += dur
    return out, total


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import jax
    from bench import make_dataset, _enable_compile_cache
    from thunder_tpu.config import ThunderConfig
    from thunder_tpu.optimiser import Optimiser
    from thunder_tpu.physics.ctf import ctf_params

    _enable_compile_cache()
    rng = np.random.default_rng(0)
    vol, imgs, _ctf_cols, _quats, _trans = make_dataset(size, n, rng)
    cfg = ThunderConfig(
        mode="3D", k=1, size=size, pixel_size=1.32,
        mask_radius=size * 1.32 / 2 * 0.9,
        trans_s=3.0, init_res=12.0, global_search_res=8.0, sym="C1",
        m_s=1024, m_l_r=32, m_l_t=16, m_reco=16,
        ignore_res=size * 1.32, trans_search_factor=0.1,
    )
    ctf = ctf_params(
        np.full(n, 300e3),
        rng.uniform(10000, 25000, n), rng.uniform(10000, 25000, n),
        rng.uniform(0, np.pi, n), np.full(n, 2.0e7), np.full(n, 0.1),
        np.zeros(n),
    )
    opt = Optimiser(cfg, imgs, ctf, np.zeros(n, np.int64), init_refs=vol)
    print("warm-up round (compile)...", file=sys.stderr, flush=True)
    opt.run_round(0)

    import shutil
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    import time
    t0 = time.time()
    with jax.profiler.trace(TRACE_DIR):
        opt.run_round(1)
        jax.block_until_ready(opt.state.refs)
    wall = time.time() - t0
    print(f"hot round wall: {wall:.2f} s ({n/wall:.1f} img/s)")

    ops, total = parse_xplane(TRACE_DIR)
    print(f"device busy total: {total:.3f} s "
          f"({100*total/wall:.0f}% of wall)")
    for name, dur in sorted(ops.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {dur*1e3:9.1f} ms  {100*dur/max(total,1e-9):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
