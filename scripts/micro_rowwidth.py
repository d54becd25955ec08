"""Row-gather rate vs row width and table size, on the real chip.

The phase-loop floor is the corner-row gather (one take of an 8-word
row per trilinear stencil, ~5.9 ns/row measured in round 2).  Questions
for the round-3 redesign:

  1. Is the per-row cost flat in row WIDTH beyond 8 words (uint32)?
     If a 16/32-word row costs the same issue, packing 2-4 stencils
     per row would multiply throughput.
  2. Where exactly is the table-SIZE cliff for 8-word rows, and does
     halving bytes (Hermitian half-space) move the operating points
     at 256px back under it?
  3. Does the conditional-negation half-space gather (select + sign
     flip) cost anything on top of the gather itself?

    python scripts/micro_rowwidth.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(out):
    # block_until_ready does NOT sync over the axon tunnel (round-2
    # finding); a host fetch of a value derived from the output does
    for leaf in jax.tree.leaves(out):
        np.asarray(jnp.sum(leaf.astype(jnp.float32)
                           if leaf.dtype == jnp.uint32 else leaf))


def timeit(f, mk_args, n=4):
    out = f(*mk_args(0))
    _sync(out)
    t0 = time.time()
    for k in range(n):
        out = f(*mk_args(k + 1))
    _sync(out)
    return (time.time() - t0) / n


S = 1 << 20  # 1M gathered rows


def row_width_sweep(widths=(8, 16, 32, 64)):
    print("== row width sweep (table 64 MB, uint32 rows) ==")
    for w in widths:
        n_rows = 64 * 2**20 // (4 * w)
        tab = jax.random.randint(
            jax.random.PRNGKey(0), (n_rows, w), 0, 1 << 30, jnp.uint32)
        idx_all = jax.random.randint(
            jax.random.PRNGKey(1), (12, S), 0, n_rows)
        jax.block_until_ready((tab, idx_all))
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        dt = timeit(f, lambda k: (tab, idx_all[k % 12]))
        print(f"  width {w:4d}: {dt*1e3:8.2f} ms  "
              f"{dt/S*1e9:6.2f} ns/row  "
              f"{S*w*4/dt/2**30:7.1f} GiB/s")


def table_size_sweep_fine():
    """Fine map of the small-table regime: where exactly does the
    row-gather rate step up?  Drives the ball-crop table-size targets."""
    print("== fine table size sweep (8-word uint32 rows) ==")
    for mb in (2, 4, 6, 8, 10, 12, 14, 16, 20, 24, 28, 34, 40, 48):
        n_rows = mb * 2**20 // 32
        tab = jax.random.randint(
            jax.random.PRNGKey(0), (n_rows, 8), 0, 1 << 30, jnp.uint32)
        idx_all = jax.random.randint(
            jax.random.PRNGKey(1), (12, S), 0, n_rows)
        jax.block_until_ready((tab, idx_all))
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        dt = timeit(f, lambda k: (tab, idx_all[k % 12]))
        print(f"  {mb:4d} MB: {dt*1e3:8.2f} ms  {dt/S*1e9:6.2f} ns/row",
              flush=True)


def table_size_sweep():
    print("== table size sweep (8-word uint32 rows) ==")
    for mb in (16, 64, 128, 256, 512):
        n_rows = mb * 2**20 // 32
        tab = jax.random.randint(
            jax.random.PRNGKey(0), (n_rows, 8), 0, 1 << 30, jnp.uint32)
        idx_all = jax.random.randint(
            jax.random.PRNGKey(1), (12, S), 0, n_rows)
        jax.block_until_ready((tab, idx_all))
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        dt = timeit(f, lambda k: (tab, idx_all[k % 12]))
        print(f"  {mb:4d} MB: {dt*1e3:8.2f} ms  {dt/S*1e9:6.2f} ns/row")


def halfspace_overhead():
    print("== half-space fold overhead (96 MB table) ==")
    n_rows = 96 * 2**20 // 32
    tab = jax.random.randint(
        jax.random.PRNGKey(0), (n_rows, 8), 0, 1 << 30, jnp.uint32)
    x_all = jax.random.uniform(jax.random.PRNGKey(1), (12, S), jnp.float32,
                               -1.0, 1.0)
    idx_all = jax.random.randint(jax.random.PRNGKey(2), (12, S), 0, n_rows)
    jax.block_until_ready((tab, x_all, idx_all))

    def plain(t, i, x):
        taps = jnp.take(t, i, axis=0)
        re = jax.lax.bitcast_convert_type(
            (taps & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
        im = jax.lax.bitcast_convert_type(
            (taps >> 16).astype(jnp.uint16), jnp.bfloat16)
        return (re.astype(jnp.float32).sum(-1), im.astype(jnp.float32).sum(-1))

    def folded(t, i, x):
        neg = x < 0
        i2 = jnp.where(neg, n_rows - 1 - i, i)
        taps = jnp.take(t, i2, axis=0)
        re = jax.lax.bitcast_convert_type(
            (taps & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
        im = jax.lax.bitcast_convert_type(
            (taps >> 16).astype(jnp.uint16), jnp.bfloat16)
        s = jnp.where(neg, -1.0, 1.0).astype(jnp.float32)
        return (re.astype(jnp.float32).sum(-1),
                im.astype(jnp.float32).sum(-1) * s)

    for name, fn in (("plain", plain), ("folded", folded)):
        f = jax.jit(fn)
        dt = timeit(f, lambda k: (tab, idx_all[k % 12], x_all[k % 12]))
        print(f"  {name:8s}: {dt*1e3:8.2f} ms  {dt/S*1e9:6.2f} ns/row")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which.startswith("w") and which[1:].isdigit():
        row_width_sweep(widths=(int(which[1:]),))
    if which in ("all", "width"):
        row_width_sweep()
    if which.startswith("w") and which[1:].isdigit():
        row_width_sweep(widths=(int(which[1:]),))
    if which in ("all", "size"):
        table_size_sweep()
    if which == "fine":
        table_size_sweep_fine()
    if which in ("all", "half"):
        halfspace_overhead()
