"""Remaining CLI tool coverage: alignZ, genmask_shell, view, bfactor, mask."""

import numpy as np

from thunder_tpu.cli import tools
from thunder_tpu.io.mrc import read_mrc, write_mrc
from thunder_tpu.physics.mask import radial_grid


def test_align_z_rotates_principal_axis(tmp_path):
    size = 32
    c = size // 2
    k = np.arange(size) - c
    kz, ky, kx = np.meshgrid(k, k, k, indexing="ij")
    # rod along x
    vol = np.exp(-((kx / 8.0) ** 2 + (ky / 2.0) ** 2 + (kz / 2.0) ** 2))
    vol = np.fft.ifftshift(vol).astype(np.float32)
    a = str(tmp_path / "rod.mrc")
    out = str(tmp_path / "alz.mrc")
    write_mrc(a, vol, 1.0)
    tools.vol_align_z(a, out)
    rot, _ = read_mrc(out)
    rc = np.fft.fftshift(rot)
    # after alignment the rod extends along z: variance along z-profile
    # through the center exceeds the x-profile
    z_profile = rc[:, c, c]
    x_profile = rc[c, c, :]
    assert z_profile.std() > x_profile.std()


def test_genmask_shell(tmp_path):
    out = str(tmp_path / "shell.mrc")
    tools.gen_mask_shell(out, size=32, r_in=6, r_out=12, ew=2)
    m, _ = read_mrc(out)
    u = np.asarray(radial_grid(32, 3))
    assert m[(u > 6.5) & (u < 11.5)].min() > 0.9
    assert m[u < 3] .max() < 0.1
    assert m[u > 15].max() < 0.1


def test_view_prints(tmp_path, capsys):
    size = 16
    vol = np.random.default_rng(0).normal(size=(size,) * 3).astype(np.float32)
    a = str(tmp_path / "v.mrc")
    write_mrc(a, vol, 2.0)
    tools.vol_view(a)
    out = capsys.readouterr().out
    assert "pixel_size=2.0" in out and "std=" in out


def test_bfactor_and_mask_tools(tmp_path):
    size = 16
    u = np.asarray(radial_grid(size, 3))
    vol = np.exp(-(u / 3.0) ** 2).astype(np.float32)
    a = str(tmp_path / "v.mrc")
    write_mrc(a, vol, 1.0)

    out = str(tmp_path / "bf.mrc")
    tools.vol_bfactor(a, out, b_factor=100.0)
    bf, _ = read_mrc(out)
    # positive B blurs: total stays (DC), peak drops
    np.testing.assert_allclose(bf.sum(), vol.sum(), rtol=1e-3)
    assert bf[0, 0, 0] < vol[0, 0, 0]

    out = str(tmp_path / "mask.mrc")
    tools.vol_mask(a, out, radius=4.0)
    mv, _ = read_mrc(out)
    assert abs(mv[0, 0, 0] - vol[0, 0, 0]) < 1e-5
    assert abs(mv[8, 8, 8]) < 1e-5


def test_tools_main_dispatch(tmp_path):
    size = 16
    u = np.asarray(radial_grid(size, 3))
    vol = np.exp(-(u / 3.0) ** 2).astype(np.float32)
    a = str(tmp_path / "v.mrc")
    write_mrc(a, vol, 1.0)
    out = str(tmp_path / "o.mrc")
    tools.main(["lowpass", "-i", a, "-o", out, "--res", "4", "--pixelsize", "1.0"])
    lp, _ = read_mrc(out)
    assert np.isfinite(lp).all()


def test_bmp_roundtrip(tmp_path):
    """8-bit BMP write/read (BMP.cpp:84-160, ImageFile::readImageBMP)."""
    from thunder_tpu.io.bmp import read_bmp, write_bmp

    rng = np.random.default_rng(0)
    img = rng.standard_normal((37, 45)).astype(np.float32)  # odd stride
    p = str(tmp_path / "t.bmp")
    write_bmp(p, img)
    back = read_bmp(p)
    assert back.shape == img.shape
    # 8-bit quantised min-max scale: correlation is the right metric
    assert np.corrcoef(back.ravel(), img.ravel())[0, 1] > 0.999


def test_bmp_in_loader(tmp_path):
    from thunder_tpu.io.bmp import write_bmp
    from thunder_tpu.io.loader import load_images
    from thunder_tpu.io.thu import ThuTable

    rng = np.random.default_rng(1)
    img = rng.standard_normal((16, 16)).astype(np.float32)
    p = str(tmp_path / "p.bmp")
    write_bmp(p, img)
    t = ThuTable.blank(2, voltage=300e3)
    t.particle_path = [p, p]
    out = load_images(t)
    assert out.shape == (2, 16, 16)
    assert np.corrcoef(out[0].ravel(), img.ravel())[0, 1] > 0.999
