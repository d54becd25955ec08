"""Brick-mode vs corner-row slice projection at the 256px local
operating point (the phase loop's gather stage).

    python scripts/micro_brick.py [r] [span] [stride]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

bench._enable_compile_cache()

import jax
import jax.numpy as jnp

from thunder_tpu.geometry.quaternion import random_quat, rotate3d, quat_mul
from thunder_tpu.ops.fourier import pack_rings
from thunder_tpu.ops.brick import brick_pack_half, project_classed_brick
from thunder_tpu.ops.projector import (oct_pack_half, project_classed,
                                       ri_split)
from thunder_tpu.optimiser import _RingsView, _proj_crop_size


def sync(x):
    np.asarray(jax.jit(
        lambda v: (jnp.sum(jnp.abs(jnp.real(v)))
                   + jnp.sum(jnp.abs(jnp.imag(v)))).astype(jnp.float32))(x))


def timeit(label, fn, *args, reps=4):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        sync(fn(*args))
    dt = (time.time() - t0) / reps * 1e3
    print(f"  {label:34s} {dt:9.1f} ms", flush=True)


def timeit_scanned(label, fn_of_rot, rot, reps=8):
    """Time ``fn_of_rot(rot)`` by running ``reps`` iterations INSIDE one
    jitted lax.scan (per-iteration input nudge defeats CSE/hoisting) —
    the tunnel's per-dispatch latency is large and noisy, so single-call
    timings are unreliable."""
    @jax.jit
    def run(rot_):
        def step(acc, i):
            out = fn_of_rot(rot_ + i * 1e-7)
            s = (jnp.sum(jnp.abs(jnp.real(out)))
                 + jnp.sum(jnp.abs(jnp.imag(out)))).astype(jnp.float32)
            return acc + s, None
        acc, _ = jax.lax.scan(
            step, jnp.float32(0), jnp.arange(reps, dtype=jnp.float32))
        return acc

    np.asarray(run(rot))                    # compile + warm
    t0 = time.time()
    np.asarray(run(rot))
    dt = (time.time() - t0) / reps * 1e3
    print(f"  {label:34s} {dt:9.1f} ms/iter", flush=True)


def main():
    size = int(os.environ.get("MB_SIZE", 256))
    pf = 2
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 42
    span = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    stride = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    L = int(os.environ.get("MB_L", 128))
    R = 125
    crop = _proj_crop_size(size, pf, r)
    rings = pack_rings(size, r, 1)
    P = rings.i_col.shape[0]
    print(f"size={size} r={r} crop={crop} L={L} R={R} P={P} "
          f"span={span} stride={stride}", flush=True)

    rng = np.random.default_rng(0)
    spec = jnp.asarray(
        rng.standard_normal((1, crop, crop, crop)).astype(np.float32))
    packed = jax.jit(lambda s: ri_split(
        jax.lax.complex(s, s * 0.5), pack_bf16=True))(spec)

    # concentrated per-image clouds (~0.2 deg spread)
    key = jax.random.PRNGKey(0)
    centre = random_quat(key, (L, 1))
    dq = random_quat(jax.random.PRNGKey(1), (L, R))
    eps = 0.002
    small = jnp.concatenate(
        [jnp.ones((L, R, 1)), eps * dq[..., 1:]], axis=-1)
    small /= jnp.linalg.norm(small, axis=-1, keepdims=True)
    quats = quat_mul(jnp.broadcast_to(centre, (L, R, 4)), small)
    rot = rotate3d(quats)
    cls = jnp.zeros((L,), jnp.int32)
    rv = _RingsView(rings.i_col, rings.i_row, size)

    oct_tab = jax.jit(lambda p: oct_pack_half(p, False))(packed)
    timeit_scanned("corner-row oct-half",
                   lambda ro: project_classed(oct_tab, cls, ro, rv, pf,
                                              False), rot)

    btab = jax.jit(lambda p: brick_pack_half(p, span, stride))(packed)
    print(f"  brick table {btab.nbytes/2**20:.0f} MB "
          f"shape={btab.shape}", flush=True)
    timeit_scanned(f"brick({span},{stride})",
                   lambda ro: project_classed_brick(
                       btab, cls, ro, rv, pf, crop, span, stride), rot)

    # v2: explicit multiply-reduce interpolation (no batched tiny dots)
    from thunder_tpu.ops.brick import (_axis_hat, guard_planes,
                                       _row_width)
    from thunder_tpu.ops.projector import _unpack_ri

    def brick_v2(tab, cls_, rot_, r_block=8):
        b = crop
        k_cls, nz, ny, nx, w_row = tab.shape
        c = b // 2
        g = guard_planes(span, stride)
        s3 = span ** 3
        fx = (rv.i_col * pf).astype(jnp.float32)
        fy = (rv.i_row * pf).astype(jnp.float32)
        x = rot_[..., 0, 0:1] * fx + rot_[..., 0, 1:2] * fy
        y = rot_[..., 1, 0:1] * fx + rot_[..., 1, 1:2] * fy
        z = rot_[..., 2, 0:1] * fx + rot_[..., 2, 1:2] * fy
        mrot = jnp.mean(rot_, axis=1)
        mx = mrot[:, 0, 0:1] * fx + mrot[:, 0, 1:2] * fy
        my = mrot[:, 1, 0:1] * fx + mrot[:, 1, 1:2] * fy
        mz = mrot[:, 2, 0:1] * fx + mrot[:, 2, 1:2] * fy
        sgn = jnp.where(mx < 0, -1.0, 1.0).astype(jnp.float32)
        mxf, myf, mzf = mx * sgn, my * sgn, mz * sgn
        half = (span - 1) / 2.0

        def anchor(v, lo, n):
            idx = jnp.round((v + lo - half) / stride).astype(jnp.int32)
            return jnp.clip(idx, 0, n - 1)

        azi, ayi, axi = (anchor(mzf, c, nz), anchor(myf, c, ny),
                         anchor(mxf, g, nx))
        lin = ((cls_[:, None] * nz + azi) * ny + ayi) * nx + axi
        taps = jnp.take(tab.reshape(-1, w_row), lin, axis=0)
        re, im = _unpack_ri(taps[..., :s3])
        br = jnp.stack([re, im * sgn[..., None]], axis=2)     # (L,P,2,s3)
        br = br.reshape(br.shape[0], br.shape[1], 2,
                        span * span, span)                    # (L,P,2,zy,x)
        oz = (azi * stride - c).astype(jnp.float32)
        oy = (ayi * stride - c).astype(jnp.float32)
        ox = (axi * stride - g).astype(jnp.float32)
        n_rot = rot_.shape[1]
        rb = min(r_block, n_rot)
        n_blk = (n_rot + rb - 1) // rb
        if n_blk * rb != n_rot:
            padr = n_blk * rb - n_rot
            x = jnp.pad(x, ((0, 0), (0, padr), (0, 0)))
            y = jnp.pad(y, ((0, 0), (0, padr), (0, 0)))
            z = jnp.pad(z, ((0, 0), (0, padr), (0, 0)))

        def blk(carry, inp):
            xb, yb, zb = inp                                  # (rb,L,P)
            xb = jnp.moveaxis(xb, 0, 1)
            yb = jnp.moveaxis(yb, 0, 1)
            zb = jnp.moveaxis(zb, 0, 1)
            wz = _axis_hat(zb * sgn[:, None] - oz[:, None], span)
            wy = _axis_hat(yb * sgn[:, None] - oy[:, None], span)
            wx = _axis_hat(xb * sgn[:, None] - ox[:, None], span)
            wzy = (wz[..., :, None] * wy[..., None, :]).reshape(
                wz.shape[0], rb, wz.shape[2], span * span)
            wzy = jnp.moveaxis(wzy, 1, 2)                     # (L,P,rb,zy)
            # multiply-reduce: t1 (L,P,2,rb,x)
            t1 = jnp.sum(br[:, :, :, None, :, :]
                         * wzy[:, :, None, :, :, None], axis=4)
            out = jnp.sum(t1 * jnp.moveaxis(wx, 1, 2)[:, :, None],
                          axis=-1)                            # (L,P,2,rb)
            return carry, out

        def rblk(v):
            vv = v.reshape(v.shape[0], n_blk, rb, v.shape[-1])
            return jnp.moveaxis(vv, 1, 0)

        _, outs = jax.lax.scan(
            blk, 0.0, (jnp.moveaxis(rblk(x), 2, 1),
                       jnp.moveaxis(rblk(y), 2, 1),
                       jnp.moveaxis(rblk(z), 2, 1)))
        outs = jnp.transpose(outs, (1, 3, 0, 4, 2))
        outs = outs.reshape(outs.shape[0], 2, n_blk * rb, outs.shape[-1])
        return jax.lax.complex(outs[:, 0, :n_rot], outs[:, 1, :n_rot])

    timeit_scanned("brick v2 (mul-reduce)",
                   lambda ro: brick_v2(btab, cls, ro), rot)
    timeit_scanned("brick v2 rb=32",
                   lambda ro: brick_v2(btab, cls, ro, r_block=32), rot)

    # component timings
    g = guard_planes(span, stride)
    s3 = span ** 3
    k_cls, nz, ny, nx, w_row = btab.shape
    c = crop // 2
    fx = (rv.i_col * pf).astype(jnp.float32)
    fy = (rv.i_row * pf).astype(jnp.float32)

    @jax.jit
    def coords_only(rot_):
        x = rot_[..., 0, 0:1] * fx + rot_[..., 0, 1:2] * fy
        y = rot_[..., 1, 0:1] * fx + rot_[..., 1, 1:2] * fy
        z = rot_[..., 2, 0:1] * fx + rot_[..., 2, 1:2] * fy
        return x + y + z

    timeit_scanned("coords only (L,R,P)x3",
                   lambda ro: coords_only(ro), rot)

    @jax.jit
    def gather_only(tab, cls_, rot_):
        mrot = jnp.mean(rot_, axis=1)
        mx = mrot[:, 0, 0:1] * fx + mrot[:, 0, 1:2] * fy
        my = mrot[:, 1, 0:1] * fx + mrot[:, 1, 1:2] * fy
        mz = mrot[:, 2, 0:1] * fx + mrot[:, 2, 1:2] * fy
        sgn = jnp.where(mx < 0, -1.0, 1.0).astype(jnp.float32)
        half = (span - 1) / 2.0

        def anchor(v, lo, n):
            idx = jnp.round((v + lo - half) / stride).astype(jnp.int32)
            return jnp.clip(idx, 0, n - 1)

        azi = anchor(mz * sgn, c, nz)
        ayi = anchor(my * sgn, c, ny)
        axi = anchor(mx * sgn, g, nx)
        lin = ((cls_[:, None] * nz + azi) * ny + ayi) * nx + axi
        taps = jnp.take(tab.reshape(-1, w_row), lin, axis=0)
        re, im = _unpack_ri(taps[..., :s3])
        return jnp.sum(re) + jnp.sum(im)

    timeit_scanned("taps gather+unpack only",
                   lambda ro: gather_only(btab, cls, ro), rot)

    @jax.jit
    def hats_only(rot_):
        x = rot_[..., 0, 0:1] * fx + rot_[..., 0, 1:2] * fy
        y = rot_[..., 1, 0:1] * fx + rot_[..., 1, 1:2] * fy
        z = rot_[..., 2, 0:1] * fx + rot_[..., 2, 1:2] * fy
        w = (_axis_hat(x, span) * _axis_hat(y, span)
             + _axis_hat(z, span))
        return jnp.sum(w)

    timeit_scanned("hat weights (L,R,P,span)x3",
                   lambda ro: hats_only(ro), rot)

    # table builds
    timeit("build oct-half", jax.jit(lambda p: oct_pack_half(p, False)),
           packed)
    timeit("build brick", jax.jit(lambda p: brick_pack_half(
        p, span, stride)), packed)


if __name__ == "__main__":
    main()
