"""End-to-end parity: the reference THUNDER binary vs thunder-tpu on the
IDENTICAL synthetic dataset (.thu + .mrcs + config).

The reference runs as a REAL 3-rank MPI job via minimpi
(native/minimpi) — master + one slave per hemisphere, the minimum
topology (appsrc/thunder.cpp:401-409).  Both implementations consume
the exact same particle stack and full reference-format JSON; parity is
judged on the FSC-0.143 crossing shell trajectory (BASELINE.json north
star: within one Fourier shell).

    python scripts/ref_parity.py /tmp/parity3d --mode 3D --size 32 \
        --n 120 --iters 5
    python scripts/ref_parity.py /tmp/parity2d --mode 2D --size 32 \
        --n 180 --iters 5 --k 3

Writes <workdir>/parity_report.json and prints a per-round table.
"""

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, **kw)


def parse_fsc(path):
    """FSC_Round_xxx.txt -> (shells, res_A, fsc (n_shell, k))."""
    rows = np.loadtxt(path, ndmin=2)
    return rows[:, 0].astype(int), rows[:, 1], rows[:, 2:]


def crossing_shell(fsc, thres=0.143):
    """First shell where FSC drops below thres (per class, best)."""
    best = 0
    for t in range(fsc.shape[1]):
        below = np.nonzero(fsc[:, t] < thres)[0]
        s = int(below[0]) if below.size else fsc.shape[0]
        best = max(best, s + 1)  # rows start at shell 1
    return best


def collect(outdir):
    rounds = {}
    for f in sorted(os.listdir(outdir)):
        if f.startswith("FSC_Round_") and f.endswith(".txt"):
            i = int(f[10:13])
            _, _, fsc = parse_fsc(os.path.join(outdir, f))
            rounds[i] = crossing_shell(fsc)
    return rounds


def main():
    p = argparse.ArgumentParser()
    p.add_argument("workdir")
    p.add_argument("--mode", default="3D", choices=["2D", "3D"])
    p.add_argument("--size", type=int, default=32)
    p.add_argument("--n", type=int, default=120)
    p.add_argument("--k", type=int, default=1)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--m-s", type=int, default=500)
    p.add_argument("--m-reco", type=int, default=30)
    p.add_argument("--sym", default="C1",
                   help="3D point-group symmetry for the workload "
                        "(the reference demo uses C4, "
                        "script/demo_3D.json); passed through to the "
                        "dataset generator")
    p.add_argument("--seed", type=int, default=0,
                   help="dataset seed (defocus-gap diagnosis sweeps "
                        "seeds to separate systematic bias from "
                        "small-box noise)")
    p.add_argument("--threads", type=int, default=0)
    p.add_argument("--ctf-error", type=float, default=0.0,
                   help="CTF-search parity workload: images carry the "
                        "true defocus, the .thu a misestimate; both "
                        "frameworks run with CTF Search on "
                        "(reference demo.json workload)")
    p.add_argument("--skip-ref", action="store_true",
                   help="reuse an existing output_ref")
    p.add_argument("--skip-tpu", action="store_true",
                   help="run/refresh only the reference side (stage the "
                        "expensive halves separately on the 1-core box)")
    p.add_argument("--platform", default="cpu", choices=["cpu", "axon"],
                   help="backend for the thunder-tpu side: cpu (default; "
                        "hermetic) or axon (the real TPU chip — the "
                        "production-box parity runs, VERDICT r4 #5)")
    a = p.parse_args()

    wd = os.path.abspath(a.workdir)
    thunder_ref = os.path.join(REPO, ".ref_build", "thunder_ref")
    mpirun = os.path.join(REPO, "native", "minimpi", "mpirun_mini")
    if not os.path.exists(thunder_ref):
        sys.exit("build the reference first: native/ref_harness/build_ref.sh")

    # -- dataset + shared config ---------------------------------------
    if not os.path.exists(os.path.join(wd, "demo.json")):
        sh([sys.executable,
            os.path.join(REPO, "examples", "make_synthetic_demo.py"), wd,
            "--mode", a.mode, "--n", str(a.n), "--size", str(a.size),
            "--k", str(a.k), "--snr", "3.0", "--sym", a.sym,
            "--seed", str(a.seed), "--ctf-error", str(a.ctf_error)])
    cfg_path = os.path.join(wd, "demo.json")
    cfg = json.load(open(cfg_path))
    cfg["Basic"]["Number of Threads Per Process"] = a.threads or 1
    cfg["Advanced"]["Max Number of Iteration"] = a.iters
    adv = cfg["Advanced"]
    adv["Number of Sampling Points for Scanning in Global Search (3D)"] = a.m_s
    adv["Number of Sampling Points Used in Reconstruction"] = a.m_reco
    json.dump(cfg, open(cfg_path, "w"), indent=2)
    out_dir = cfg["Basic"]["Path of Output"]

    report = {"config": cfg_path, "mode": a.mode, "size": a.size, "n": a.n}

    # -- reference run (3 real MPI ranks over minimpi) ------------------
    ref_out = os.path.join(wd, "output_ref")
    if not (a.skip_ref and os.path.isdir(ref_out)):
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(out_dir)
        t0 = time.time()
        sh([mpirun, "3", thunder_ref, cfg_path], cwd=wd)
        report["ref_seconds"] = time.time() - t0
        if os.path.isdir(ref_out):
            shutil.rmtree(ref_out)
        os.rename(out_dir, ref_out)

    if a.skip_tpu:
        json.dump(report, open(os.path.join(wd, "parity_report.json"),
                               "w"), indent=1)
        print("reference side done (--skip-tpu); rerun with --skip-ref")
        return

    # -- thunder-tpu run ------------------------------------------------
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    plat = ("import jax; jax.config.update('jax_platforms','cpu');"
            if a.platform == "cpu" else "")
    env = dict(os.environ)
    if a.platform == "axon":
        # the axon sitecustomize registers a TPU session in EVERY
        # python process on its PYTHONPATH — including THIS parent,
        # whose idle claim can wedge the child's chip session.  Run the
        # parent claim-free (PYTHONPATH without /root/.axon_site) and
        # hand the axon path only to the child.
        env["PYTHONPATH"] = os.pathsep.join(
            ["/root/.axon_site"]
            + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
               if p])
        env.setdefault("JAX_PLATFORMS", "axon")
    sh([sys.executable, "-c",
        plat +
        "import sys; sys.path.insert(0, %r);"
        "from thunder_tpu.cli import thunder;"
        "sys.argv=['thunder', %r]; thunder.main()" % (REPO, cfg_path)],
       cwd=wd, env=env)
    report["tpu_seconds"] = time.time() - t0
    tpu_out = os.path.join(wd, "output_tpu")
    if os.path.isdir(tpu_out):
        shutil.rmtree(tpu_out)
    os.rename(out_dir, tpu_out)

    # -- compare --------------------------------------------------------
    ref_rounds = collect(ref_out)
    tpu_rounds = collect(tpu_out)
    print("\nround  ref-0.143-shell  tpu-0.143-shell")
    rows = []
    for i in sorted(set(ref_rounds) | set(tpu_rounds)):
        r = ref_rounds.get(i)
        t = tpu_rounds.get(i)
        rows.append({"round": i, "ref_shell": r, "tpu_shell": t})
        print(f"{i:5d}  {r!s:>15}  {t!s:>15}")
    report["rounds"] = rows
    if a.ctf_error:
        # the defocus-factor column of the final .thu should recover
        # ~1+ctf_error on both frameworks (Particle::rand d-draws /
        # saveDatabase col 25)
        sys.path.insert(0, REPO)
        from thunder_tpu.io.thu import read_thu

        for tag, d in (("ref", ref_out), ("tpu", tpu_out)):
            metas = sorted(glob.glob(os.path.join(d, "Meta_Round_*.thu")))
            if metas:
                tbl = read_thu(metas[-1])
                med = float(np.median(np.asarray(tbl.defocus_factor)))
                report[f"{tag}_defocus_factor_median"] = med
                print(f"{tag}: median defocus factor {med:.4f} "
                      f"(truth {1 + a.ctf_error:.4f})")
    if a.k > 1:
        # class-occupancy agreement (classification parity): the final
        # .thu class column vs the generator's truth, scored as the
        # best-permutation assignment accuracy (class labels are
        # arbitrary — Optimiser::refreshClassDistr only tracks counts)
        import itertools

        sys.path.insert(0, REPO)
        from thunder_tpu.io.thu import read_thu

        truth = np.load(os.path.join(wd, "truth.npy"))
        for tag, d in (("ref", ref_out), ("tpu", tpu_out)):
            metas = sorted(glob.glob(os.path.join(d, "Meta_Round_*.thu")))
            if not metas:
                continue
            cls = np.asarray(read_thu(metas[-1]).class_id, int)
            best = 0.0
            for perm in itertools.permutations(range(a.k)):
                acc = float(np.mean(np.take(perm, cls) == truth))
                best = max(best, acc)
            occ = np.bincount(cls, minlength=a.k) / len(cls)
            report[f"{tag}_class_accuracy"] = best
            report[f"{tag}_class_occupancy"] = occ.round(4).tolist()
            print(f"{tag}: class accuracy (best perm) {best:.3f}, "
                  f"occupancy {occ.round(3).tolist()}")

    last = rows[-1] if rows else {}
    if last.get("ref_shell") is not None and last.get("tpu_shell") is not None:
        report["final_shell_diff"] = abs(last["ref_shell"] - last["tpu_shell"])
        print(f"\nfinal-round FSC-0.143 shells: ref={last['ref_shell']} "
              f"tpu={last['tpu_shell']} "
              f"(|diff| = {report['final_shell_diff']})")
    json.dump(report, open(os.path.join(wd, "parity_report.json"), "w"),
              indent=2)
    print("report ->", os.path.join(wd, "parity_report.json"))


if __name__ == "__main__":
    main()
