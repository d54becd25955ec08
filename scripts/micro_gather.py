"""A/B gather formulations for the slice projector on the current backend."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, n=5):
    """Times with a forced d2h sync (block_until_ready through the
    remote relay can return before execution finishes)."""
    import jax
    import numpy as _np

    out = fn(*args)
    _np.asarray(jax.tree.leaves(out)[0])  # d2h of the float scalar
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        _np.asarray(jax.tree.leaves(out)[0])
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from bench import _enable_compile_cache

    _enable_compile_cache()

    big = 256
    L, R, P = 512, 32, 384
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)

    @jax.jit
    def make(ks):
        vol = (jax.random.normal(ks[0], (big,) * 3)
               + 1j * jax.random.normal(ks[1], (big,) * 3)).astype(jnp.complex64)
        x = jax.random.uniform(ks[2], (L, R, P), minval=-100.0, maxval=100.0)
        y = jax.random.uniform(ks[3], (L, R, P), minval=-100.0, maxval=100.0)
        z = jax.random.uniform(ks[2], (L, R, P), minval=-100.0, maxval=100.0)
        return vol, x, y, z

    vol, x, y, z = make(jnp.stack(list(ks)))
    c = big // 2

    def corners(x, y, z):
        fx, fy, fz = jnp.floor(x), jnp.floor(y), jnp.floor(z)
        wx, wy, wz = x - fx, y - fy, z - fz
        ix = fx.astype(jnp.int32) + c
        iy = fy.astype(jnp.int32) + c
        iz = fz.astype(jnp.int32) + c
        return ix, iy, iz, wx, wy, wz

    @jax.jit
    def v_4d(vol, x, y, z):
        ix, iy, iz, wx, wy, wz = corners(x, y, z)
        out = 0.0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    w = ((wz if dz else 1 - wz) * (wy if dy else 1 - wy)
                         * (wx if dx else 1 - wx))
                    out += vol[jnp.clip(iz + dz, 0, big - 1),
                               jnp.clip(iy + dy, 0, big - 1),
                               jnp.clip(ix + dx, 0, big - 1)] * w.astype(vol.dtype)
        return out

    @jax.jit
    def v_flat(vol, x, y, z):
        ix, iy, iz, wx, wy, wz = corners(x, y, z)
        flat = vol.reshape(-1)
        out = 0.0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    w = ((wz if dz else 1 - wz) * (wy if dy else 1 - wy)
                         * (wx if dx else 1 - wx))
                    lin = ((jnp.clip(iz + dz, 0, big - 1) * big
                            + jnp.clip(iy + dy, 0, big - 1)) * big
                           + jnp.clip(ix + dx, 0, big - 1))
                    out += jnp.take(flat, lin, axis=0) * w.astype(vol.dtype)
        return out

    @jax.jit
    def v_flat_split(vol, x, y, z):
        # gather real/imag separately as float32 (complex gathers may
        # take a slow path)
        ix, iy, iz, wx, wy, wz = corners(x, y, z)
        fr = jnp.real(vol).reshape(-1)
        fi = jnp.imag(vol).reshape(-1)
        out_r = 0.0
        out_i = 0.0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    w = ((wz if dz else 1 - wz) * (wy if dy else 1 - wy)
                         * (wx if dx else 1 - wx))
                    lin = ((jnp.clip(iz + dz, 0, big - 1) * big
                            + jnp.clip(iy + dy, 0, big - 1)) * big
                           + jnp.clip(ix + dx, 0, big - 1))
                    out_r += jnp.take(fr, lin, axis=0) * w
                    out_i += jnp.take(fi, lin, axis=0) * w
        return jax.lax.complex(out_r, out_i)

    @jax.jit
    def v_nearest(vol, x, y, z):
        # lower bound: single-tap nearest gather
        ix = jnp.clip(jnp.rint(x).astype(jnp.int32) + c, 0, big - 1)
        iy = jnp.clip(jnp.rint(y).astype(jnp.int32) + c, 0, big - 1)
        iz = jnp.clip(jnp.rint(z).astype(jnp.int32) + c, 0, big - 1)
        lin = (iz * big + iy) * big + ix
        return jnp.take(vol.reshape(-1), lin, axis=0)

    vols = vol[None]  # (K=1, big, big, big)
    cls = jnp.zeros((L,), jnp.int32)

    @jax.jit
    def v_stack_vi(vols, cls, x, y, z):
        ix, iy, iz, wx, wy, wz = corners(x, y, z)
        vi = cls.reshape(L, 1, 1)
        out = 0.0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    w = ((wz if dz else 1 - wz) * (wy if dy else 1 - wy)
                         * (wx if dx else 1 - wx))
                    out += vols[vi, jnp.clip(iz + dz, 0, big - 1),
                                jnp.clip(iy + dy, 0, big - 1),
                                jnp.clip(ix + dx, 0, big - 1)] * w.astype(vols.dtype)
        return out

    @jax.jit
    def v_stack_zfold(vols, cls, x, y, z):
        # fold the class index into z: one 3-index gather from a
        # (K*big, big, big) view
        k_cls = vols.shape[0]
        volz = vols.reshape(k_cls * big, big, big)
        ix, iy, iz, wx, wy, wz = corners(x, y, z)
        zoff = (cls * big).reshape(L, 1, 1)
        out = 0.0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    w = ((wz if dz else 1 - wz) * (wy if dy else 1 - wy)
                         * (wx if dx else 1 - wx))
                    out += volz[jnp.clip(iz + dz, 0, big - 1) + zoff,
                                jnp.clip(iy + dy, 0, big - 1),
                                jnp.clip(ix + dx, 0, big - 1)] * w.astype(vols.dtype)
        return out

    def summed(fn):
        return jax.jit(lambda *a: jnp.real(fn(*a)).sum())

    for name, fn, args in (
        ("4d-index", v_4d, (vol, x, y, z)),
        ("flat-take", v_flat, (vol, x, y, z)),
        ("flat-split-ri", v_flat_split, (vol, x, y, z)),
        ("nearest-1tap", v_nearest, (vol, x, y, z)),
        ("stack-vi", v_stack_vi, (vols, cls, x, y, z)),
        ("stack-zfold", v_stack_zfold, (vols, cls, x, y, z)),
    ):
        t = timeit(summed(fn), *args)
        print(f"{name:15s}: {t * 1e3:8.1f} ms", flush=True)

    err_fn = jax.jit(lambda vols, cls, x, y, z: jnp.abs(
        v_stack_vi(vols, cls, x, y, z) - v_4d(vols[0], x, y, z)).max())
    print("stack-vi max err vs 4d:", float(err_fn(vols, cls, x, y, z)), flush=True)
    err_fn2 = jax.jit(lambda vols, cls, x, y, z: jnp.abs(
        v_stack_zfold(vols, cls, x, y, z) - v_4d(vols[0], x, y, z)).max())
    print("stack-zfold max err vs 4d:", float(err_fn2(vols, cls, x, y, z)), flush=True)


if __name__ == "__main__":
    main()
