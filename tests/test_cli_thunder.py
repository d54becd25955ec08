"""Full CLI workflow: config JSON + .thu + stacks -> E-M rounds ->
artifacts (the reference's demo workflow, docs/README.md:246-260)."""

import json
import os

import numpy as np
import pytest

from thunder_tpu.io.mrc import write_mrc, read_mrc
from thunder_tpu.io.thu import ThuTable, write_thu, read_thu


@pytest.fixture()
def demo_dir(tmp_path):
    from tests.test_e2e_2d import make_dataset  # noqa
    import sys
    sys.path.insert(0, "tests")
    from test_e2e_2d import make_dataset

    size, n = 32, 32
    imgs, truth = make_dataset(size, n)
    stack = str(tmp_path / "particles.mrcs")
    write_mrc(stack, imgs, pixel_size=1.0, is_stack=True)

    t = ThuTable.blank(n, voltage=300e3)
    t.defocus_u = np.full(n, 2000.0)
    t.defocus_v = np.full(n, 2000.0)
    t.cs = np.zeros(n)
    t.amplitude_contrast = np.full(n, 0.1)
    t.particle_path = [f"{i + 1:04d}@{stack}" for i in range(n)]
    thu = str(tmp_path / "particles.thu")
    write_thu(thu, t)

    config = {
        "Basic": {
            "2D or 3D Mode": "2D",
            "Global Search": True,
            "Local Search": True,
            "CTF Search": False,
            "Number of Classes": 2,
            "Size of Image": size,
            "Pixel Size (Angstrom)": 1.0,
            "Radius of Mask on Images (Angstrom)": 12.0,
            "Estimated Translation (Pixel)": 2.0,
            "Initial Resolution (Angstrom)": 8.0,
            "Perform Global Search Under (Angstrom)": 4.0,
            "Symmetry": "C1",
            "Initial Model": "",
            ".thu File Storing Paths and CTFs of Images": thu,
            "Path of Particles": "",
            "Path of Output": str(tmp_path / "out") + "/",
        },
        "Advanced": {
            "Number of Sampling Points for Scanning in Global Search (2D)": 64,
            "Number of Sampling Points of Rotation in Local Search (2D)": 9,
            "Number of Sampling Points of Translation in Local Search": 9,
            "Number of Sampling Points Used in Reconstruction": 16,
            "Ignore Signal Under (Angstrom)": 32.0,
            "Max Number of Iteration": 2,
        },
        "Professional": {"Translation Search Factor": 0.25},
    }
    cfg_path = str(tmp_path / "demo.json")
    with open(cfg_path, "w") as f:
        json.dump(config, f)
    return tmp_path, cfg_path, thu


@pytest.mark.slow
def test_thunder_cli_end_to_end(demo_dir):
    tmp_path, cfg_path, thu_path = demo_dir
    from thunder_tpu.cli.thunder import main

    assert main([cfg_path, "--max-rounds", "2"]) == 0

    out = tmp_path / "out"
    assert (out / "FSC_Round_000.txt").exists()
    assert (out / "Class_Info_Round_000.txt").exists()
    assert (out / "Meta_Round_001.thu").exists()
    assert (out / "Reference_Round_001.mrcs").exists()
    assert (out / "Reference_Final.mrcs").exists()

    stack, ps = read_mrc(str(out / "Reference_Round_001.mrcs"), shift=False)
    assert stack.shape[0] == 2  # K classes

    meta = read_thu(str(out / "Meta_Round_001.thu"))
    assert len(meta) == 32
    assert np.isfinite(meta.score).all()

    # resume path: global search off, poses from the checkpoint
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["Basic"]["Global Search"] = False
    cfg["Basic"][".thu File Storing Paths and CTFs of Images"] = str(
        out / "Meta_Round_001.thu"
    )
    cfg["Basic"]["Path of Output"] = str(tmp_path / "out2") + "/"
    cfg2_path = str(tmp_path / "resume.json")
    with open(cfg2_path, "w") as f:
        json.dump(cfg, f)
    assert main([cfg2_path, "--max-rounds", "1"]) == 0
    assert (tmp_path / "out2" / "FSC_Round_000.txt").exists()
