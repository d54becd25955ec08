import numpy as np
import pytest

from thunder_tpu.io import native
from thunder_tpu.io.mrc import write_mrc, MrcFile
from thunder_tpu.io.thu import ThuTable, write_thu, read_thu


@pytest.fixture(scope="module")
def have_native():
    if not native.available():
        pytest.skip("native io library unavailable (no toolchain)")
    return True


def test_native_thu_matches_python(tmp_path, have_native):
    t = ThuTable.blank(4)
    t.particle_path = [f"{i + 1:04d}@stack.mrcs" for i in range(4)]
    t.micrograph_path = ["mic.mrc"] * 4
    rng = np.random.default_rng(0)
    t.quat = rng.normal(size=(4, 4))
    t.trans = rng.normal(size=(4, 2))
    t.defocus_u = rng.uniform(1e4, 3e4, 4)
    t.score = rng.normal(size=4)
    path = str(tmp_path / "t.thu")
    write_thu(path, t)

    py = read_thu(path)
    nat = native.read_thu_native(path)
    assert nat is not None
    np.testing.assert_allclose(nat.quat, py.quat, atol=1e-9)
    np.testing.assert_allclose(nat.trans, py.trans, atol=1e-9)
    np.testing.assert_allclose(nat.defocus_u, py.defocus_u, atol=1e-6)
    np.testing.assert_allclose(nat.score, py.score, atol=1e-9)
    assert nat.particle_path == py.particle_path
    assert nat.micrograph_path == py.micrograph_path


def test_native_mrc_matches_python(tmp_path, have_native):
    rng = np.random.default_rng(1)
    stack = rng.normal(size=(6, 16, 16)).astype(np.float32)
    path = str(tmp_path / "s.mrcs")
    write_mrc(path, stack, pixel_size=1.1, is_stack=True)

    f = MrcFile(path)
    idx = [0, 3, 5]
    py = f.read_slices(idx)
    nat = native.read_mrc_slices_native(path, idx)
    assert nat is not None
    np.testing.assert_allclose(nat, py, atol=1e-6)

    # unshifted read matches the raw file too
    nat_raw = native.read_mrc_slices_native(path, idx, shift=False)
    py_raw = f.read_slices(idx, shift=False)
    np.testing.assert_allclose(nat_raw, py_raw, atol=1e-6)


def test_thu_comment_lines_skipped(tmp_path, have_native):
    """The reference writes '#'-comment column headers into saved
    Meta_Round_xxx.thu files and strips them on read
    (Database.cpp:66-85); resuming from one must work on both the
    python and the native parser."""
    t = ThuTable.blank(3)
    t.particle_path = [f"{i + 1:04d}@stack.mrcs" for i in range(3)]
    t.micrograph_path = ["mic.mrc"] * 3
    rng = np.random.default_rng(2)
    t.quat = rng.normal(size=(3, 4))
    path = str(tmp_path / "t.thu")
    write_thu(path, t)
    lines = open(path).read().splitlines()
    with open(str(tmp_path / "c.thu"), "w") as f:
        f.write("#0:VOLTAGE\tFLOAT\t18.9f\n")
        f.write("  # indented comment\n\n")
        f.write("\n".join(lines) + "\n")
        f.write("#trailing comment\n")
    cpath = str(tmp_path / "c.thu")

    py = read_thu(cpath)
    assert py.quat.shape == (3, 4)
    np.testing.assert_allclose(py.quat, t.quat, atol=1e-9)
    nat = native.read_thu_native(cpath)
    assert nat is not None
    np.testing.assert_allclose(nat.quat, t.quat, atol=1e-9)
    assert nat.particle_path == t.particle_path
