"""Isolate the sweep inserter's height-pass formulation cost.

    python scripts/micro_insert.py [size]

Times insert_sweep_3d at the bench operating point (B = L*D slices)
plus standalone height-pass variants to pick the einsum form.
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

bench._enable_compile_cache()

import jax
import jax.numpy as jnp

from thunder_tpu.ops.insert import (
    _Z_KERNEL_WIDTH,
    _hat,
    _sweep_coeffs,
    _sweep_s1,
    insert_sweep_3d,
)


@jax.jit
def _leaf_scalar(l):
    # axon tunnel: eager ops + complex d2h are UNIMPLEMENTED — sync via
    # an in-jit f32 reduction over BOTH components (avoid imag-tree DCE)
    return (jnp.sum(jnp.abs(jnp.real(l))) +
            jnp.sum(jnp.abs(jnp.imag(l)))).astype(jnp.float32)


def sync(x):
    leaves = jax.tree.leaves(x)
    s = 0.0
    for l in leaves[:2]:
        s += float(_leaf_scalar(l))
    return s


def timeit(label, fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        sync(out)
    dt = (time.time() - t0) / reps * 1e3
    print(f"  {label:44s} {dt:9.1f} ms", flush=True)
    return out


def height_variant(form: str, chunk: int, ch: int, big: int, nk: int):
    """Standalone height pass over pre-built s1 chunks."""
    gg = jnp.arange(big, dtype=jnp.float32) - big // 2
    zw = _Z_KERNEL_WIDTH

    @jax.jit
    def run(s1_all, alc2_all, bec2_all, case_all):
        n_chunks = s1_all.shape[0]

        def step(acc, inp):
            s1, alc2, bec2, case_c = inp
            zeta = (alc2[:, None, None] * gg[None, None, :]
                    + bec2[:, None, None] * gg[None, :, None])
            if form == "old":
                wz = _hat((gg[None, :, None, None] - zeta[:, None]) / zw) / zw
                new = []
                for ci in range(3):
                    new.append(acc[ci] + jnp.einsum(
                        "baml,bcml->caml",
                        wz * case_c[:, ci, None, None, None], s1))
                return tuple(new), 0.0
            wz = _hat((gg[None, :, None, None] - zeta[:, None]) / zw) / zw
            s1c = (case_c[:, :, None, None, None] * s1[:, None]).reshape(
                chunk, 3 * ch, big, big)
            if form == "merged_bf16_mlca":
                out = jnp.einsum("bcml,baml->mlca", s1c.astype(jnp.bfloat16),
                                 wz.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
            elif form == "merged_f32_caml":
                out = jnp.einsum("baml,bcml->caml", wz, s1c)
            elif form == "merged_bf16_caml":
                out = jnp.einsum("baml,bcml->caml", wz.astype(jnp.bfloat16),
                                 s1c.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
            elif form == "merged_bf16_amcl":
                out = jnp.einsum("baml,bcml->amcl", wz.astype(jnp.bfloat16),
                                 s1c.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
            elif form == "merged_fp8_wz":
                # wz in fp8 (values in [0, 0.5]); s1c stays bf16 — tests
                # whether the upcast fuses into the dot operand load
                out = jnp.einsum("bcml,baml->mlca", s1c.astype(jnp.bfloat16),
                                 wz.astype(jnp.float8_e4m3fn
                                           ).astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
            elif form == "merged_fp8_both":
                out = jnp.einsum("bcml,baml->mlca",
                                 s1c.astype(jnp.float8_e4m3fn),
                                 wz.astype(jnp.float8_e4m3fn),
                                 preferred_element_type=jnp.float32)
            return acc + out, 0.0

        if form == "old":
            acc0 = tuple(jnp.zeros((3, big, big, big), jnp.float32)
                         for _ in range(3))
        elif form.endswith("mlca"):
            acc0 = jnp.zeros((big, big, 3 * ch, big), jnp.float32)
        elif form.endswith("amcl"):
            acc0 = jnp.zeros((big, big, 3 * ch, big), jnp.float32)
        else:
            acc0 = jnp.zeros((3 * ch, big, big, big), jnp.float32)
        acc, _ = jax.lax.scan(step, acc0,
                              (s1_all, alc2_all, bec2_all, case_all))
        return acc

    return run


def timeit_scanned(label, fn_of_rot, rot, reps=4):
    """reps iterations inside ONE jitted scan (tunnel dispatch latency
    is ~100x noisy for single-call timings)."""
    import numpy as _np

    @jax.jit
    def run(rot_):
        def step(acc, i):
            out = fn_of_rot(rot_ + i * 1e-7)
            s = 0.0
            for l in jax.tree.leaves(out)[:2]:
                s += (jnp.sum(jnp.abs(jnp.real(l)))
                      + jnp.sum(jnp.abs(jnp.imag(l)))).astype(jnp.float32)
            return acc + s, None
        acc, _ = jax.lax.scan(
            step, jnp.float32(0), jnp.arange(reps, dtype=jnp.float32))
        return acc

    _np.asarray(run(rot))
    t0 = time.time()
    _np.asarray(run(rot))
    dt = (time.time() - t0) / reps * 1e3
    print(f"  {label:44s} {dt:9.1f} ms/iter", flush=True)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    r_u = int(sys.argv[2]) if len(sys.argv) > 2 else (31 if size == 256
                                                     else 17)
    nk = 2 * r_u - 1
    grid = min(size, 2 * (r_u + 2))
    grid += grid % 2
    big = grid * 2
    L, D = 128, 100
    B = L * D
    chunk = 128
    ch = 3

    rng = np.random.default_rng(0)
    print(f"size={size} B={B} nk={nk} big={big}", flush=True)

    # full inserter (complex h2d is UNIMPLEMENTED over the axon tunnel:
    # ship re/im floats and form complex inside the jit)
    vals_re = jnp.asarray(rng.standard_normal((B, nk, nk)), jnp.float32)
    vals_im = jnp.asarray(rng.standard_normal((B, nk, nk)), jnp.float32)
    ctf2w = jnp.asarray(rng.random((B, nk, nk)), jnp.float32)
    q = rng.standard_normal((B, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, xq, yq, zq = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    rot_np = np.stack([
        np.stack([1 - 2*(yq*yq + zq*zq), 2*(xq*yq - w*zq), 2*(xq*zq + w*yq)], -1),
        np.stack([2*(xq*yq + w*zq), 1 - 2*(xq*xq + zq*zq), 2*(yq*zq - w*xq)], -1),
        np.stack([2*(xq*zq - w*yq), 2*(yq*zq + w*xq), 1 - 2*(xq*xq + yq*yq)], -1),
    ], axis=-2)
    rot = jnp.asarray(rot_np)
    w_cls = jnp.ones((1, B), jnp.float32) / B

    reps = 3

    @jax.jit
    def run_full(ro, vr, vi, cw, w):
        # all operands are ARGUMENTS: closing over them embeds ~0.5 GB
        # of constants in the program and overflows the tunnel's
        # remote-compile request limit (HTTP 413)
        def step(acc, i):
            f, t = insert_sweep_3d(jax.lax.complex(vr, vi), cw,
                                   ro + i * 1e-7, w, big=big, pf=2)
            s = (jnp.sum(jnp.abs(jnp.real(f)))
                 + jnp.sum(jnp.abs(jnp.imag(f))) + jnp.sum(t))
            return acc + s.astype(jnp.float32), None
        acc, _ = jax.lax.scan(
            step, jnp.float32(0), jnp.arange(reps, dtype=jnp.float32))
        return acc

    np.asarray(run_full(rot, vals_re, vals_im, ctf2w, w_cls))
    t0 = time.time()
    np.asarray(run_full(rot, vals_re, vals_im, ctf2w, w_cls))
    print(f"  insert_sweep_3d (full) {(time.time()-t0)/reps*1e3:9.1f} "
          f"ms/iter", flush=True)
    if len(sys.argv) > 2:
        return   # custom radius: only the full-inserter timing

    # standalone height-pass variants on synthetic s1
    n_chunks = B // chunk
    s1_all = jnp.asarray(rng.standard_normal(
        (n_chunks, chunk, ch, big, big)).astype(np.float32))
    alc2 = jnp.asarray(rng.uniform(-1, 1, (n_chunks, chunk)), jnp.float32)
    bec2 = jnp.asarray(rng.uniform(-1, 1, (n_chunks, chunk)), jnp.float32)
    case = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, 3, (n_chunks, chunk))), 3)
    # fp8 einsums raise TypeError on this jax/XLA (and v5e's MXU is
    # bf16/int8 anyway) — kept to re-test on future toolchains; the
    # production form is merged_bf16_mlca (measured 141 ms at B=12800,
    # within ~20% of the wz-traffic floor)
    for form in ("merged_bf16_mlca", "merged_fp8_wz", "merged_fp8_both"):
        fn = height_variant(form, chunk, ch, big, nk)
        try:
            timeit(f"height[{form}]", fn, s1_all, alc2, bec2, case)
        except Exception as e:
            print(f"  height[{form}]  FAILED: {type(e).__name__}",
                  flush=True)


if __name__ == "__main__":
    main()
