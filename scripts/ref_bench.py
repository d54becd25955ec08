"""Measure the REFERENCE binary's throughput on the bench dataset —
grounding bench.py's V100-era baseline with an in-image number
(VERDICT r3 #2).

Exports bench.make_dataset's exact images/CTF/initial volume to
.mrcs/.thu/MRC, writes the full reference JSON at the demo-grade grid
(script/demo_3D.json: mS=10000, mLR=125, mLT=9, mReco=100), runs
`mpirun_mini 3 thunder_ref` (the reference's minimum topology,
appsrc/thunder.cpp:401-409), and times each round from the mtimes of
the per-round FSC files the reference writes at round end.

    python scripts/ref_bench.py /tmp/refbench --size 128 --n 256 --iters 3

Writes <workdir>/ref_bench.json:
    {"per_round_s": [...], "img_per_sec": ...,
     "host": "1-core (3 time-shared ranks)"}

The result is a CPU number on whatever host runs it; it grounds the
scale of the reference's per-round cost on identical data, not a V100
measurement (no NVIDIA hardware in-image; see BASELINE.md).
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def export_dataset(wd: str, size: int, n: int):
    import bench
    from thunder_tpu.io.mrc import write_mrc
    from thunder_tpu.io.thu import ThuTable, write_thu

    rng = np.random.default_rng(0)
    vol, imgs, ctf_cols, _, _ = bench.make_dataset(size, n, rng)
    write_mrc(os.path.join(wd, "init_model.mrc"), vol, 1.32)
    write_mrc(os.path.join(wd, "particles.mrcs"), imgs, 1.32,
              is_stack=True)
    t = ThuTable.blank(n, voltage=300e3)
    t.defocus_u = ctf_cols[1]
    t.defocus_v = ctf_cols[2]
    t.defocus_theta = ctf_cols[3]
    t.cs = ctf_cols[4]
    t.amplitude_contrast = ctf_cols[5]
    t.particle_path = [f"{i + 1:06d}@particles.mrcs" for i in range(n)]
    write_thu(os.path.join(wd, "particles.thu"), t)


def write_config(wd: str, size: int, iters: int, threads: int,
                 m_s: int, m_l_r: int, m_l_t: int, m_reco: int) -> str:
    cfg = {
        "Basic": {
            "Number of Threads Per Process": threads,
            "2D or 3D Mode": "3D",
            "Global Search": True,
            "Local Search": True,
            "CTF Search": False,
            "Number of Classes": 1,
            "Size of Image": size,
            "Pixel Size (Angstrom)": 1.32,
            "Radius of Mask on Images (Angstrom)": size * 1.32 / 2 * 0.9,
            "Estimated Translation (Pixel)": 3,
            "Initial Resolution (Angstrom)": 12.0,
            "Perform Global Search Under (Angstrom)": 8.0,
            "Symmetry": "C1",
            "Initial Model": os.path.join(wd, "init_model.mrc"),
            ".thu File Storing Paths and CTFs of Images":
                os.path.join(wd, "particles.thu"),
            "Path of Particles": wd + "/",
            "Path of Output": os.path.join(wd, "output") + "/",
            "Prefix of Output": "",
            "Calculate FSC Using Core Region": False,
            "Calculate FSC Using Masked Region": False,
            "Particle Grading": False,
            "Auto-Recentre Reference": True,
        },
        "Reference Mask": {
            "Perform Reference Mask": False,
            "Perform Reference Mask During Global Search": False,
            "Provided Mask": "",
        },
        "Subtract": {
            "Subtract Masked Region Reference From Images": False,
            "Region Need to Be Centred": "",
        },
        "Advanced": {
            "Max Number of Iteration": iters,
            "Using Golden Standard FSC": True,
            "Padding Factor": 2,
            "MKB Kernel Radius": 1.9,
            "MKB Kernel Smooth Factor": 15.0,
            "Number of Sampling Points for Scanning in Global Search (2D)":
                100,
            "Number of Sampling Points for Scanning in Global Search (3D)":
                m_s,
            "Number of Sampling Points of Rotation in Local Search (2D)": 9,
            "Number of Sampling Points of Rotation in Local Search (3D)":
                m_l_r,
            "Number of Sampling Points of Translation in Local Search":
                m_l_t,
            "Number of Sampling Points of Defocus in Local Search": 9,
            "Number of Sampling Points Used in Reconstruction": m_reco,
            "Ignore Signal Under (Angstrom)": size * 1.32,
            "Correct Intensity Scale Using Signal Under (Angstrom)": 40.0,
            "FSC Threshold for Cutoff Frequency": 0.143,
            "FSC Threshold for Reporting Resolution": 0.143,
            "FSC Threshold for Scale Correction": 0.75,
            "Grouping when Calculating Sigma": True,
            "Grouping when Correcting Intensity Scale": False,
            "Mask Images with Zero Noise": True,
            "CTF Refine Standard Deviation": 0.01,
            "Save Reference(s) Each Iteration": True,
            "Save .thu File Each Iteration": True,
        },
        "Professional": {
            "Translation Search Factor": 0.1,
            "Perturbation Factor (Large)": 2.0,
            "Perturbation Factor (Small, Global)": 0.5,
            "Perturbation Factor (Small, Local)": 0.5,
            "Perturbation Factor (Small, CTF)": 0.5,
            "Skip Expectation": False,
            "Skip Maximization": False,
            "Skip Reconstruction": False,
        },
    }
    path = os.path.join(wd, "ref_bench.json")
    with open(path, "w") as f:
        json.dump(cfg, f, indent=2)
    return path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("workdir")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--threads", type=int, default=1)
    p.add_argument("--m-s", type=int, default=10000)
    p.add_argument("--m-l-r", type=int, default=125)
    p.add_argument("--m-l-t", type=int, default=9)
    p.add_argument("--m-reco", type=int, default=100)
    a = p.parse_args()

    wd = os.path.abspath(a.workdir)
    os.makedirs(wd, exist_ok=True)
    thunder_ref = os.path.join(REPO, ".ref_build", "thunder_ref")
    mpirun = os.path.join(REPO, "native", "minimpi", "mpirun_mini")
    if not os.path.exists(thunder_ref):
        sys.exit("build the reference first: native/ref_harness/build_ref.sh")

    if not os.path.exists(os.path.join(wd, "particles.thu")):
        # force the dataset build onto CPU: this script may run beside
        # a TPU job, and only reads cached .npz when bench ran first
        import jax

        jax.config.update("jax_platforms", "cpu")
        export_dataset(wd, a.size, a.n)
    cfg_path = write_config(wd, a.size, a.iters, a.threads,
                            a.m_s, a.m_l_r, a.m_l_t, a.m_reco)
    out_dir = os.path.join(wd, "output")
    os.makedirs(out_dir, exist_ok=True)

    t0 = time.time()
    subprocess.run([mpirun, "3", thunder_ref, cfg_path], cwd=wd,
                   check=True)
    total = time.time() - t0

    # per-round walls from the FSC file mtimes (written at round end)
    marks = [(int(f[10:13]), os.path.getmtime(os.path.join(out_dir, f)))
             for f in sorted(os.listdir(out_dir))
             if f.startswith("FSC_Round_") and f.endswith(".txt")]
    per_round = []
    prev = t0
    for _, m in marks:
        per_round.append(round(m - prev, 2))
        prev = m
    report = {
        "size": a.size, "n": a.n, "iters": a.iters,
        "threads_per_rank": a.threads,
        "grid": {"m_s": a.m_s, "m_l_r": a.m_l_r, "m_l_t": a.m_l_t,
                 "m_reco": a.m_reco},
        "total_s": round(total, 2),
        "per_round_s": per_round,
        "img_per_sec_mean": round(a.n * len(per_round)
                                  / max(sum(per_round), 1e-9), 3),
        "img_per_sec_best_round": round(a.n / max(min(per_round), 1e-9), 3)
        if per_round else None,
        "host": f"{os.cpu_count()}-core host, 3 time-shared MPI ranks",
    }
    with open(os.path.join(wd, "ref_bench_result.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
