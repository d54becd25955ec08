"""Bisect the flat-inserter cost on the real chip: v1 (dense sweep) vs
windowed-height (dense in-plane) vs full (banded in-plane too).

ALL data is generated on device inside jit — the axon tunnel's complex
h2d transfers are UNIMPLEMENTED and big f32 transfers are slow/fragile.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/micro_insert_modes.py [--local|--global] [--big N --nk N]
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp

from thunder_tpu.ops.insert import (insert_sweep_3d, insert_sweep_flat3d)
from thunder_tpu.geometry.quaternion import quat_mul, rotate3d


def sync(t):
    return float(jax.device_get(jnp.ravel(t)[0]))


@functools.partial(jax.jit, static_argnames=("n_img", "n_draw", "nk",
                                             "clustered"))
def make_inputs(key, n_img: int, n_draw: int, nk: int, clustered: bool):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    n = n_img * n_draw
    vals = jax.lax.complex(jax.random.normal(k1, (n, nk, nk)),
                           jax.random.normal(k2, (n, nk, nk)))
    ctf2w = jax.random.uniform(k3, (n, nk, nk), minval=0.1, maxval=1.0)
    w_cls = jax.random.uniform(k4, (1, n), minval=0.2, maxval=1.0)
    kq, kp = jax.random.split(k5)
    base = jax.random.normal(kq, (n_img, 4))
    base = base / jnp.linalg.norm(base, axis=-1, keepdims=True)
    if clustered:
        ax = jax.random.normal(kp, (n_img, n_draw, 3))
        ax = ax / jnp.linalg.norm(ax, axis=-1, keepdims=True)
        ang = jax.random.uniform(kp, (n_img, n_draw), maxval=0.01)
        pert = jnp.concatenate([jnp.cos(ang / 2)[..., None],
                                jnp.sin(ang / 2)[..., None] * ax], -1)
        q = jax.vmap(lambda p, b: jax.vmap(
            lambda pp: quat_mul(pp, b))(p))(pert, base)
        q = q.reshape(-1, 4)
    else:
        q = jax.random.normal(kp, (n, 4))
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return vals, ctf2w, w_cls, rotate3d(q)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", type=int, default=348)
    ap.add_argument("--nk", type=int, default=169)
    ap.add_argument("--n-img", type=int, default=128)
    ap.add_argument("--n-draw", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=24)
    ap.add_argument("--modes", default="full,height,v1")
    ap.add_argument("--spread", action="store_true",
                    help="uniform orientations (global-round batch)")
    args = ap.parse_args()
    n = args.n_img * args.n_draw

    v, cw, wc, rot = make_inputs(jax.random.PRNGKey(0), args.n_img,
                                 args.n_draw, args.nk,
                                 not args.spread)
    sync(cw)

    fns = {
        "full": lambda: insert_sweep_flat3d(v, cw, rot, wc, args.big, 2,
                                            chunk=args.chunk,
                                            banded_s1=True),
        "height": lambda: insert_sweep_flat3d(v, cw, rot, wc, args.big, 2,
                                              chunk=args.chunk,
                                              banded_s1=False),
        "v1": lambda: insert_sweep_3d(v, cw, rot, wc, args.big, 2,
                                      chunk=args.chunk),
    }
    for name in args.modes.split(","):
        fn = fns[name]
        t0 = time.perf_counter()
        out = fn()
        sync(out[1])
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn()
            sync(out[1])
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{name:7s}: {best*1e3:8.0f} ms ({best/n*1e6:6.0f} us/slice)"
              f"  [compile+1st {compile_s:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
