"""Microbench: the sweep inserter's HEIGHT pass at rU-band grids.

The 256px local-round profile shows reco_insert = 10.5 s, ~62% of the
round (BENCH_r04).  The height pass contracts the dense hat field
wz (b, a, m, l) against s1c (b, c, m, l) with batch dims (m, l) MINOR
in both operands — XLA must transpose ~2 GB per chunk step before the
batched dot.  Variant B stores both operands batch-major (m, l, ...)
so the dot consumes them in place.

Run on the TPU: python scripts/micro_insert_height.py [--big 352]
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp

from thunder_tpu.ops.insert import _hat, _Z_KERNEL_WIDTH


def sync(x):
    return float(jax.device_get(jnp.ravel(x)[0]))


@functools.partial(jax.jit, static_argnames=("big", "ch", "chunk"))
def variant_a(s1, alc2, bec2, case_c, big: int, ch: int, chunk: int):
    """Current layout (ops/insert.py:_sweep_height_pass)."""
    gg = jnp.arange(big, dtype=jnp.float32) - big // 2
    zw = _Z_KERNEL_WIDTH

    def step(acc, inp):
        s1c_, al, be, cc = inp
        zeta = (al[:, None, None] * gg[None, None, :]
                + be[:, None, None] * gg[None, :, None])
        wz = (_hat((gg[None, :, None, None] - zeta[:, None]) / zw) / zw
              ).astype(jnp.bfloat16)
        s1c = (cc[:, :, None, None, None] * s1c_[:, None]).reshape(
            chunk, 3 * ch, big, big).astype(jnp.bfloat16)
        contrib = jnp.einsum("bcml,baml->mlca", s1c, wz,
                             preferred_element_type=jnp.float32)
        return acc + contrib, 0.0

    acc0 = jnp.zeros((big, big, 3 * ch, big), jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, (s1, alc2, bec2, case_c))
    return acc


@functools.partial(jax.jit, static_argnames=("big", "ch", "chunk"))
def variant_b(s1, alc2, bec2, case_c, big: int, ch: int, chunk: int):
    """Batch-major: wz as (m, l, b, a), s1c as (m, l, C, b)."""
    gg = jnp.arange(big, dtype=jnp.float32) - big // 2
    zw = _Z_KERNEL_WIDTH

    def step(acc, inp):
        s1c_, al, be, cc = inp
        zeta = (al[None, None, :] * gg[None, :, None]
                + be[None, None, :] * gg[:, None, None])       # (m, l, b)
        wz = (_hat((gg[None, None, None, :] - zeta[..., None]) / zw) / zw
              ).astype(jnp.bfloat16)                           # (m,l,b,a)
        # s1c_ (b, ch, m, l) -> (m, l, 3*ch_fold, b) with case fold
        s1t = jnp.transpose(s1c_, (2, 3, 1, 0))                # (m,l,ch,b)
        s1c = (cc.T[None, None, :, None, :] * s1t[:, :, None]).reshape(
            big, big, 3 * ch, chunk).astype(jnp.bfloat16)
        contrib = jnp.einsum("mlcb,mlba->mlca", s1c, wz,
                             preferred_element_type=jnp.float32)
        return acc + contrib, 0.0

    acc0 = jnp.zeros((big, big, 3 * ch, big), jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, (s1, alc2, bec2, case_c))
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", type=int, default=352)
    ap.add_argument("--chunk", type=int, default=24)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--ch", type=int, default=3)
    args = ap.parse_args()
    big, chunk, ch = args.big, args.chunk, args.ch
    n = args.steps * chunk

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    s1 = jax.random.normal(k1, (args.steps, chunk, ch, big, big),
                           jnp.float32)
    ang = jax.random.uniform(k2, (2, args.steps, chunk), minval=-1.4,
                             maxval=1.4)
    alc2, bec2 = ang[0], ang[1]
    case = jax.random.randint(k3, (args.steps, chunk), 0, 3)
    case_c = (case[..., None] == jnp.arange(3)).astype(jnp.float32)

    gb_wz = n * big**3 * 2 / 1e9
    print(f"big={big} chunk={chunk} slices={n} ch={ch} "
          f"wz traffic ~{gb_wz:.0f} GB (write) per full pass")

    for name, fn in (("A current (bcml,baml)", variant_a),
                     ("B batch-major (mlcb,mlba)", variant_b)):
        acc = fn(s1, alc2, bec2, case_c, big, ch, chunk)
        sync(acc)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            acc = fn(s1, alc2, bec2, case_c, big, ch, chunk)
            sync(acc)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"  {name:28s}: {best*1e3:8.1f} ms "
              f"({best/n*1e3:.2f} ms/slice, "
              f"{2*gb_wz/best:.0f} GB/s eff wz rd+wr)")


if __name__ == "__main__":
    main()
