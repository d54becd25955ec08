import os

import numpy as np
import jax.numpy as jnp
import pytest

from thunder_tpu.io.mrc import read_mrc, write_mrc, MrcFile
from thunder_tpu.io.thu import ThuTable, read_thu, write_thu, parse_stack_ref
from thunder_tpu.io.star import star_to_thu, thu_to_star
from thunder_tpu.physics.mask import radial_grid


def test_mrc_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(16, 16, 16)).astype(np.float32)
    path = str(tmp_path / "v.mrc")
    write_mrc(path, vol, pixel_size=1.32)
    back, ps = read_mrc(path)
    np.testing.assert_allclose(back, vol, atol=1e-6)
    assert abs(ps - 1.32) < 1e-5


def test_mrc_stack_slices(tmp_path):
    rng = np.random.default_rng(1)
    stack = rng.normal(size=(5, 8, 8)).astype(np.float32)
    path = str(tmp_path / "s.mrcs")
    write_mrc(path, stack, pixel_size=1.0, is_stack=True)
    f = MrcFile(path)
    assert f.n_slices == 5
    np.testing.assert_allclose(f.read_slice(3), np.fft.ifftshift(
        np.fft.fftshift(stack[3])), atol=1e-6)


def test_thu_roundtrip(tmp_path):
    t = ThuTable.blank(3)
    t.particle_path = ["0001@s.mrcs", "0002@s.mrcs", "p.mrc"]
    t.micrograph_path = ["m1.mrc"] * 3
    t.quat = np.asarray([[1, 0, 0, 0], [0.5, 0.5, 0.5, 0.5], [0, 1, 0, 0]], float)
    t.score = np.asarray([1.5, 2.5, 3.5])
    path = str(tmp_path / "t.thu")
    write_thu(path, t)
    back = read_thu(path)
    assert len(back) == 3
    np.testing.assert_allclose(back.quat, t.quat, atol=1e-8)
    np.testing.assert_allclose(back.score, t.score, atol=1e-8)
    assert back.particle_path == t.particle_path
    assert parse_stack_ref("0002@s.mrcs") == ("s.mrcs", 2)
    assert parse_stack_ref("p.mrc") == ("p.mrc", None)


def test_star_thu_conversion(tmp_path):
    star = tmp_path / "in.star"
    star.write_text(
        "\ndata_\n\nloop_\n"
        "_rlnVoltage #1\n_rlnDefocusU #2\n_rlnDefocusV #3\n"
        "_rlnDefocusAngle #4\n_rlnSphericalAberration #5\n"
        "_rlnAmplitudeContrast #6\n_rlnImageName #7\n"
        "300.0 20000 19000 45.0 2.0 0.1 0001@stack.mrcs\n"
        "300.0 21000 20000 30.0 2.0 0.1 0002@stack.mrcs\n"
    )
    t = star_to_thu(str(star))
    assert len(t) == 2
    np.testing.assert_allclose(t.voltage, [300e3, 300e3])
    np.testing.assert_allclose(t.cs, [2e7, 2e7])
    np.testing.assert_allclose(t.defocus_theta[0], np.deg2rad(45.0))

    out = tmp_path / "out.star"
    thu_to_star(str(out), t)
    assert "rlnAngleRot" in out.read_text()


def test_tools_roundtrips(tmp_path):
    from thunder_tpu.cli import tools

    u = np.asarray(radial_grid(16, 3))
    vol = np.exp(-(u / 3.0) ** 2).astype(np.float32)
    a = str(tmp_path / "a.mrc")
    b = str(tmp_path / "b.mrc")
    write_mrc(a, vol, 1.0)
    write_mrc(b, vol * 2, 1.0)

    out = str(tmp_path / "avg.mrc")
    tools.vol_average([a, b], out)
    avg, _ = read_mrc(out)
    np.testing.assert_allclose(avg, vol * 1.5, atol=1e-5)

    out = str(tmp_path / "diff.mrc")
    tools.vol_minus(b, a, out)
    diff, _ = read_mrc(out)
    np.testing.assert_allclose(diff, vol, atol=1e-5)

    out = str(tmp_path / "lp.mrc")
    tools.vol_lowpass(a, out, res_a=4.0, pixel_size=1.0)
    lp, _ = read_mrc(out)
    assert np.isfinite(lp).all()
    # low-pass keeps the total mass (DC) but shaves detail
    np.testing.assert_allclose(lp.sum(), vol.sum(), rtol=1e-3)

    out = str(tmp_path / "rs.mrc")
    tools.vol_resize(a, out, 8)
    rs, ps = read_mrc(out)
    assert rs.shape == (8, 8, 8)
    assert abs(ps - 2.0) < 1e-5

    out = str(tmp_path / "m.mrc")
    tools.gen_mask(a, out, thres=0.5, ext=1.0, ew=1.0)
    m, _ = read_mrc(out)
    assert m.max() == 1.0 and m.min() == 0.0
    assert m[0, 0, 0] == 1.0


def test_project_reconstruct_roundtrip(tmp_path, monkeypatch):
    """thunder_project -> thunder_reconstruct recovers the phantom
    (the reference's natural first integration target, SURVEY §3.5)."""
    from thunder_tpu.cli import project as prj
    from thunder_tpu.cli import reconstruct as rec

    size = 24
    u = np.asarray(radial_grid(size, 3))
    c = size // 2
    k = np.arange(size) - c
    kz, ky, kx = np.meshgrid(k, k, k, indexing="ij")
    phantom = np.fft.ifftshift(
        np.exp(-((kx - 3) ** 2 + ky**2 + kz**2) / (2 * 2.5**2))
        + np.exp(-((kx + 3) ** 2 + ky**2 + kz**2) / (2 * 2.0**2))
    ).astype(np.float32)

    vol_path = str(tmp_path / "vol.mrc")
    write_mrc(vol_path, phantom, 1.0)

    stack = str(tmp_path / "projs.mrcs")
    thu = str(tmp_path / "poses.thu")
    monkeypatch.chdir(tmp_path)
    prj.main(["-i", vol_path, "-o", stack, "-n", "200", "--save-thu", thu])

    out = str(tmp_path / "rec.mrc")
    rec.main(["--thu", thu, "-o", out, "--size", str(size),
              "--pixelsize", "1.0", "--no-ctf"])
    recon, _ = read_mrc(out)
    m = u < size // 2 - 4
    corr = np.corrcoef(recon[m], phantom[m])[0, 1]
    assert corr > 0.95, f"reconstruction corr {corr}"
