import numpy as np
import jax
import pytest

from thunder_tpu.physics.mask import radial_grid
from thunder_tpu.postprocess import postprocess


@pytest.mark.slow
def test_postprocess_pipeline():
    rng = np.random.default_rng(0)
    size = 32
    u = np.asarray(radial_grid(size, 3))
    # flat-spectrum signal (a steep gaussian would have a gigantic
    # B factor and legitimately overflow float32 sharpening)
    import jax.numpy as jnp
    from thunder_tpu.ops.fourier import fft3_centered, ifft3_centered
    from thunder_tpu.physics.filters import low_pass_filter

    raw = rng.standard_normal((size,) * 3).astype(np.float32)
    smooth = np.asarray(ifft3_centered(
        low_pass_filter(fft3_centered(jnp.asarray(raw)), 0.35, 0.1)
    ))
    signal = (smooth * np.exp(-(u / 8.0) ** 2)).astype(np.float32) * 10
    a = signal + rng.standard_normal((size,) * 3).astype(np.float32) * 0.05
    b = signal + rng.standard_normal((size,) * 3).astype(np.float32) * 0.05
    mask = (u < 10).astype(np.float32)

    res = postprocess(a, b, mask, pixel_size=1.0)
    assert res.map_sharp.shape == (size,) * 3
    assert np.isfinite(res.map_sharp).all()
    # strong common signal: true FSC high at low shells
    assert res.fsc_true[1:5].min() > 0.9
    assert res.res_shell >= 4
    assert np.isfinite(res.b_factor)
    # merged map correlates with the signal
    m = u < 8
    corr = np.corrcoef(res.map_avg[m], signal[m])[0, 1]
    assert corr > 0.95


def test_stackview_tools(tmp_path):
    from thunder_tpu.cli import stackview
    from thunder_tpu.io.mrc import write_mrc
    from thunder_tpu.io.thu import ThuTable, write_thu, read_thu

    rng = np.random.default_rng(1)
    stack = rng.normal(size=(6, 16, 16)).astype(np.float32)
    spath = str(tmp_path / "cls.mrcs")
    write_mrc(spath, stack, 1.0, is_stack=True)
    png = str(tmp_path / "sheet.png")
    stackview.main(["show", "-i", spath, "-o", png])
    with open(png, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"

    t = ThuTable.blank(10)
    t.class_id = np.asarray([0, 1, 2, 0, 1, 2, 0, 1, 2, 0])
    tpath = str(tmp_path / "m.thu")
    write_thu(tpath, t)
    out = str(tmp_path / "sel.thu")
    stackview.main(["select", "-i", tpath, "-o", out, "--classes", "0", "2"])
    sel = read_thu(out)
    assert len(sel) == 7
    assert set(sel.class_id) == {0, 2}
