"""Microbench: dense sweep vs windowed flat inserter at 256px-local
shapes (big=348, nk=169, ~4096 slices/hemisphere).

Local-like batch: 128 images x 32 compacted draws, per-image clouds a
few mrad wide (windowed branch everywhere after sorting).
Global-like batch: uniformly random orientations (dense fallback).

Run on TPU: PYTHONPATH=/root/.axon_site:/root/repo python scripts/micro_insert_flat.py
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from thunder_tpu.geometry.quaternion import random_quat, rotate3d
from thunder_tpu.ops.insert import insert_sweep_3d, insert_sweep_flat3d


def sync(x):
    # axon: complex d2h transfers are UNIMPLEMENTED — sync on the real
    # T grid (same program as F)
    return float(jax.device_get(jnp.ravel(x[1])[0]))


def local_quats(n_img, n_draw, dev=0.01, seed=0):
    rng = np.random.default_rng(seed)
    base = np.asarray(random_quat(jax.random.PRNGKey(seed), (n_img,)))
    ax = rng.standard_normal((n_img, n_draw, 3))
    ax /= np.linalg.norm(ax, axis=-1, keepdims=True)
    ang = rng.uniform(0, dev, (n_img, n_draw))
    pert = np.concatenate([np.cos(ang / 2)[..., None],
                           np.sin(ang / 2)[..., None] * ax], axis=-1)
    w, x, y, z = [pert[..., i] for i in range(4)]
    w2, x2, y2, z2 = [base[:, None, i] for i in range(4)]
    q = np.stack([
        w * w2 - x * x2 - y * y2 - z * z2,
        w * x2 + x * w2 + y * z2 - z * y2,
        w * y2 - x * z2 + y * w2 + z * x2,
        w * z2 + x * y2 - y * x2 + z * w2], axis=-1)
    return q.reshape(-1, 4).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", type=int, default=348)
    ap.add_argument("--nk", type=int, default=169)
    ap.add_argument("--n-img", type=int, default=128)
    ap.add_argument("--n-draw", type=int, default=32)
    ap.add_argument("--skip-dense", action="store_true")
    args = ap.parse_args()
    big, nk = args.big, args.nk
    n = args.n_img * args.n_draw
    pf = 2

    rng = np.random.default_rng(1)
    # complex h2d transfers are UNIMPLEMENTED on the axon backend:
    # ship re/im as f32 and form complex on device
    vr = rng.standard_normal((n, nk, nk)).astype(np.float32)
    vi = rng.standard_normal((n, nk, nk)).astype(np.float32)
    ctf2w = rng.uniform(0.1, 1.0, (n, nk, nk)).astype(np.float32)
    w_cls = rng.uniform(0.2, 1.0, (1, n)).astype(np.float32)
    v = jax.jit(jax.lax.complex)(jnp.asarray(vr), jnp.asarray(vi))
    cw, wc = jnp.asarray(ctf2w), jnp.asarray(w_cls)

    batches = {
        "local(img-clustered)": rotate3d(jnp.asarray(local_quats(
            args.n_img, args.n_draw))),
        "global(uniform)": rotate3d(random_quat(jax.random.PRNGKey(9),
                                                (n,))),
    }
    fns = {"flat-windowed": lambda r: insert_sweep_flat3d(
               v, cw, r, wc, big, pf, chunk=24)}
    if not args.skip_dense:
        fns["dense-sweep"] = lambda r: insert_sweep_3d(
            v, cw, r, wc, big, pf)

    for bname, rot in batches.items():
        for fname, fn in fns.items():
            out = fn(rot)
            sync(out)
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                out = fn(rot)
                sync(out)
                ts.append(time.perf_counter() - t0)
            best = min(ts)
            print(f"{bname:22s} {fname:14s}: {best*1e3:8.0f} ms "
                  f"({best/n*1e6:.0f} us/slice)", flush=True)


if __name__ == "__main__":
    main()
