"""Volume/image utility tools — the rebuild of the reference's small
CLI binaries (appsrc/thunder_{average,minus,lowpass,bfactor,mask,resize,
alignZ,view,genmask,genmask_shell}.cpp).

Each function is importable; ``main`` dispatches subcommands:

    python -m thunder_tpu.cli.tools average -i a.mrc b.mrc -o out.mrc
    python -m thunder_tpu.cli.tools lowpass -i in.mrc -o out.mrc --res 10 --pixelsize 1.32
    ...
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import jax.numpy as jnp

from thunder_tpu.constants import EDGE_WIDTH_FT, EDGE_WIDTH_RL
from thunder_tpu.io.mrc import read_mrc, write_mrc
from thunder_tpu.ops.fourier import fft3_centered, ifft3_centered
from thunder_tpu.physics.filters import b_factor_filter, low_pass_filter
from thunder_tpu.physics.mask import auto_mask, radial_grid, soft_mask_weight


def vol_average(paths: list[str], out: str):
    """thunder_average: mean of volumes."""
    acc, ps = None, 1.0
    for p in paths:
        v, ps = read_mrc(p)
        acc = v if acc is None else acc + v
    write_mrc(out, acc / len(paths), ps)


def vol_minus(a: str, b: str, out: str):
    """thunder_minus: difference of two volumes."""
    va, ps = read_mrc(a)
    vb, _ = read_mrc(b)
    write_mrc(out, va - vb, ps)


def vol_lowpass(path: str, out: str, res_a: float, pixel_size: float | None = None,
                ew: float = EDGE_WIDTH_FT):
    """thunder_lowpass: cosine-edge low-pass at a resolution [A]."""
    v, ps = read_mrc(path)
    ps = pixel_size or ps
    size = v.shape[-1]
    ft = fft3_centered(jnp.asarray(v))
    thres = ps / res_a  # cycles per pixel
    out_v = ifft3_centered(low_pass_filter(ft, thres, ew / size))
    write_mrc(out, np.asarray(out_v), ps)


def vol_bfactor(path: str, out: str, b_factor: float):
    """thunder_bfactor: apply a B factor."""
    v, ps = read_mrc(path)
    ft = fft3_centered(jnp.asarray(v))
    out_v = ifft3_centered(b_factor_filter(ft, b_factor))
    write_mrc(out, np.asarray(out_v), ps)


def vol_mask(path: str, out: str, mask_path: str | None = None,
             radius: float | None = None, ew: float = EDGE_WIDTH_RL):
    """thunder_mask: multiply by a provided mask or a soft spherical one."""
    v, ps = read_mrc(path)
    size = v.shape[-1]
    if mask_path:
        m, _ = read_mrc(mask_path)
    else:
        r = radius if radius is not None else size // 2 - ew
        m = np.asarray(soft_mask_weight(size, v.ndim, r, ew))
    write_mrc(out, v * m, ps)


def vol_resize(path: str, out: str, new_size: int):
    """thunder_resize: Fourier crop/pad to a new box size."""
    v, ps = read_mrc(path)
    size = v.shape[-1]
    ft = np.asarray(fft3_centered(jnp.asarray(v)))
    c, nc = size // 2, new_size // 2
    if new_size < size:
        sl = tuple(slice(c - nc, c - nc + new_size) for _ in range(v.ndim))
        ft2 = ft[sl]
    else:
        ft2 = np.zeros((new_size,) * v.ndim, dtype=ft.dtype)
        sl = tuple(slice(nc - c, nc - c + size) for _ in range(v.ndim))
        ft2[sl] = ft
    out_v = np.asarray(ifft3_centered(jnp.asarray(ft2))) * (new_size / size) ** v.ndim
    write_mrc(out, out_v, ps * size / new_size)


def vol_align_z(path: str, out: str):
    """thunder_alignZ: rotate so the principal axis of the density lies
    along z (reference uses alignZ of a direction; we use the inertia
    tensor's dominant eigenvector)."""
    from scipy.ndimage import affine_transform

    v, ps = read_mrc(path)
    size = v.shape[-1]
    vc = np.fft.fftshift(v)
    c = size // 2
    k = np.arange(size) - c
    kz, ky, kx = np.meshgrid(k, k, k, indexing="ij")
    w = np.maximum(vc, 0)
    tot = w.sum() or 1.0
    cov = np.zeros((3, 3))
    coords = [kx, ky, kz]
    for i in range(3):
        for j in range(3):
            cov[i, j] = (w * coords[i] * coords[j]).sum() / tot
    evals, evecs = np.linalg.eigh(cov)
    axis = evecs[:, -1]
    if axis[2] < 0:
        axis = -axis
    z = np.array([0.0, 0.0, 1.0])
    vv = np.cross(axis, z)
    s = np.linalg.norm(vv)
    if s < 1e-8:
        rot = np.eye(3)
    else:
        cth = float(np.dot(axis, z))
        vx = np.array([[0, -vv[2], vv[1]], [vv[2], 0, -vv[0]], [-vv[1], vv[0], 0]])
        rot = np.eye(3) + vx + vx @ vx * ((1 - cth) / s**2)
    # resample: output voxel (x,y,z) pulls from rot^T @ (x,y,z)
    mat = rot.T[::-1, ::-1]  # (z,y,x) index convention
    off = np.array([c, c, c]) - mat @ np.array([c, c, c])
    out_v = affine_transform(vc, mat, offset=off, order=1)
    write_mrc(out, np.fft.ifftshift(out_v), ps)


def vol_view(path: str):
    """thunder_view: print header stats + central-slice ASCII preview."""
    v, ps = read_mrc(path)
    print(f"{path}: shape={v.shape} pixel_size={ps:.4f}")
    print(f"min={v.min():.4g} max={v.max():.4g} mean={v.mean():.4g} std={v.std():.4g}")
    vc = np.fft.fftshift(v)
    sl = vc[vc.shape[0] // 2] if v.ndim == 3 else vc
    step = max(1, sl.shape[0] // 32)
    small = sl[::step, ::step]
    lo, hi = small.min(), small.max()
    chars = " .:-=+*#%@"
    for row in small:
        print("".join(chars[int((x - lo) / (hi - lo + 1e-12) * 9)] for x in row))


def gen_mask(path: str, out: str, thres: float | None = None,
             ext: float = 2.0, ew: float = 4.0, radius: float | None = None):
    """thunder_genmask: auto-mask from a volume."""
    v, ps = read_mrc(path)
    size = v.shape[-1]
    r = radius if radius is not None else size // 2 - 2
    if thres is not None:
        from thunder_tpu.physics.mask import _remove_isolated_points
        from scipy import ndimage

        m = np.fft.fftshift((v > thres).astype(np.float32))
        m = _remove_isolated_points(m)
        if ext > 0:
            d = ndimage.distance_transform_edt(m == 0)
            m = np.where(d < ext, 1.0, m).astype(np.float32)
        if ew > 0:
            d = ndimage.distance_transform_edt(m == 0)
            edge = (d != 0) & (d < ew)
            m = np.where(edge, 0.5 + 0.5 * np.cos(d / ew * np.pi), m).astype(np.float32)
        m = np.fft.ifftshift(m)
    else:
        m = auto_mask(v, r, ext, ew)
    write_mrc(out, m, ps)


def gen_mask_shell(out: str, size: int, r_in: float, r_out: float,
                   ew: float = EDGE_WIDTH_RL, pixel_size: float = 1.0):
    """thunder_genmask_shell: soft spherical-shell mask."""
    u = np.asarray(radial_grid(size, 3))
    outer = np.asarray(soft_mask_weight(size, 3, r_out, ew))
    inner = np.asarray(soft_mask_weight(size, 3, max(r_in - ew, 0), ew))
    write_mrc(out, (outer - inner).clip(0, 1).astype(np.float32), pixel_size)
    del u


def main(argv=None):
    p = argparse.ArgumentParser(prog="thunder_tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("average"); s.add_argument("-i", nargs="+", required=True); s.add_argument("-o", required=True)
    s = sub.add_parser("minus"); s.add_argument("-a", required=True); s.add_argument("-b", required=True); s.add_argument("-o", required=True)
    s = sub.add_parser("lowpass"); s.add_argument("-i", required=True); s.add_argument("-o", required=True); s.add_argument("--res", type=float, required=True); s.add_argument("--pixelsize", type=float)
    s = sub.add_parser("bfactor"); s.add_argument("-i", required=True); s.add_argument("-o", required=True); s.add_argument("--bfactor", type=float, required=True)
    s = sub.add_parser("mask"); s.add_argument("-i", required=True); s.add_argument("-o", required=True); s.add_argument("--mask"); s.add_argument("--radius", type=float)
    s = sub.add_parser("resize"); s.add_argument("-i", required=True); s.add_argument("-o", required=True); s.add_argument("--size", type=int, required=True)
    s = sub.add_parser("alignz"); s.add_argument("-i", required=True); s.add_argument("-o", required=True)
    s = sub.add_parser("view"); s.add_argument("-i", required=True)
    s = sub.add_parser("genmask"); s.add_argument("-i", required=True); s.add_argument("-o", required=True); s.add_argument("--thres", type=float); s.add_argument("--ext", type=float, default=2.0); s.add_argument("--ew", type=float, default=4.0); s.add_argument("--radius", type=float)
    s = sub.add_parser("genmask_shell"); s.add_argument("-o", required=True); s.add_argument("--size", type=int, required=True); s.add_argument("--rin", type=float, required=True); s.add_argument("--rout", type=float, required=True); s.add_argument("--pixelsize", type=float, default=1.0)

    a = p.parse_args(argv)
    if a.cmd == "average":
        vol_average(a.i, a.o)
    elif a.cmd == "minus":
        vol_minus(a.a, a.b, a.o)
    elif a.cmd == "lowpass":
        vol_lowpass(a.i, a.o, a.res, a.pixelsize)
    elif a.cmd == "bfactor":
        vol_bfactor(a.i, a.o, a.bfactor)
    elif a.cmd == "mask":
        vol_mask(a.i, a.o, a.mask, a.radius)
    elif a.cmd == "resize":
        vol_resize(a.i, a.o, a.size)
    elif a.cmd == "alignz":
        vol_align_z(a.i, a.o)
    elif a.cmd == "view":
        vol_view(a.i)
    elif a.cmd == "genmask":
        gen_mask(a.i, a.o, a.thres, a.ext, a.ew, a.radius)
    elif a.cmd == "genmask_shell":
        gen_mask_shell(a.o, a.size, a.rin, a.rout, pixel_size=a.pixelsize)


if __name__ == "__main__":
    main()
