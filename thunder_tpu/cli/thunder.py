"""Main E-M driver CLI — the rebuild of appsrc/thunder.cpp.

    python -m thunder_tpu.cli.thunder demo_2D.json

Reads the reference-compatible JSON config, the .thu metadata and the
particle stacks, runs the E-M loop, and writes the reference's per-round
artifacts: FSC_Round_xxx.txt, Class_Info_Round_xxx.txt, Meta_Round_xxx.thu
and Reference_xxx_Round_xxx maps (docs/README.md:246-260).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np

log = logging.getLogger("thunder")


def save_round_artifacts(opt, thu, out_dir: str, i_round: int):
    from thunder_tpu.io.mrc import write_mrc
    from thunder_tpu.io.thu import write_thu

    cfg = opt.cfg
    fsc = opt.model.fsc
    # the file carries only the reconstruction band's shells, like the
    # reference's saveFSC of the rU-sized _FSC (Model.cpp:316)
    band = int(getattr(opt, "_fsc_band", fsc.shape[1]))
    with open(os.path.join(out_dir, f"FSC_Round_{i_round:03d}.txt"), "w") as f:
        for i in range(1, min(fsc.shape[1], band)):
            res_a = cfg.size * cfg.pixel_size / i
            f.write(f"{i:05d} {res_a:10.6f} "
                    + " ".join(f"{fsc[t, i]:10.6f}" for t in range(cfg.k))
                    + "\n")

    cls = opt.class_assignments()
    with open(os.path.join(out_dir, f"Class_Info_Round_{i_round:03d}.txt"), "w") as f:
        for t in range(cfg.k):
            occ = float((cls == t).mean()) if len(cls) else 0.0
            from thunder_tpu.physics import spectrum

            res_shell = spectrum.res_p(fsc[t], cfg.thres_report_fsc, 1, 1)
            res_a = (cfg.size * cfg.pixel_size / res_shell
                     if res_shell > 0 else float("inf"))
            f.write(f"{t:6d} {occ:10.6f} {res_a:10.6f}\n")

    if cfg.save_thu_each_iter and thu is not None:
        from thunder_tpu.io.thu import write_thu

        out = opt.export_thu(thu)
        write_thu(os.path.join(out_dir, f"Meta_Round_{i_round:03d}.thu"), out)

    if cfg.save_refs_each_iter:
        # saved per-round maps come from the MAP-free reconstruction
        # pass, like the reference's fscSave (Optimiser.cpp:7460)
        refs = getattr(opt, "_refs_report", None)
        if refs is None:
            refs = opt.state.refs
        if cfg.mode_2d:
            write_mrc(
                os.path.join(out_dir, f"Reference_Round_{i_round:03d}.mrcs"),
                opt.class_averages(), cfg.pixel_size, is_stack=True,
            )
        else:
            for t in range(cfg.k):
                for h, tag in ((0, "A"), (1, "B")):
                    write_mrc(
                        os.path.join(
                            out_dir,
                            f"Reference_{t:03d}_{tag}_Round_{i_round:03d}.mrc",
                        ),
                        np.asarray(refs[h, t]), cfg.pixel_size,
                    )


def main(argv=None):
    p = argparse.ArgumentParser(prog="thunder")
    p.add_argument("config", help="JSON config (reference-compatible)")
    p.add_argument("--max-rounds", type=int, default=None)
    p.add_argument("--no-mesh", action="store_true",
                   help="force single-device execution even when several "
                        "devices are visible")
    p.add_argument("--coordinator", default=None,
                   help="multi-host coordinator address (host:port)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    a = p.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )

    # persistent compilation cache: repeat runs skip the slow compiles
    import jax

    try:
        cache_dir = os.path.expanduser("~/.cache/thunder_tpu_jax")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from thunder_tpu.config import ThunderConfig
    from thunder_tpu.io.loader import load_images
    from thunder_tpu.io.mrc import read_mrc
    from thunder_tpu.io.thu import read_thu
    from thunder_tpu.optimiser import Optimiser
    from thunder_tpu.physics.ctf import ctf_params

    cfg = ThunderConfig.from_json(a.config)
    if cfg.par_gra and cfg.k != 1:
        # the reference warns and ignores grading outside refinement
        # (Optimiser.cpp:6726-6734)
        log.warning("particle grading is only recommended in refinement,"
                    " not classification; ignored with k=%d", cfg.k)
    out_dir = cfg.dst_prefix or "./"
    os.makedirs(out_dir, exist_ok=True)

    log.info("reading %s", cfg.db)
    thu = read_thu(cfg.db)
    # class-count sanity check (Optimiser.cpp:345-354, where the
    # reference aborts): with fewer than MIN_N_IMAGES_PER_CLASS /
    # CLASS_BALANCE_FACTOR images per class, classification cannot
    # populate its classes.  Warn rather than abort — tiny synthetic
    # workloads are legitimate here
    max_k = int(len(thu) * 0.05 / 3)  # CLASS_BALANCE_FACTOR=0.05, MIN=3
    if cfg.k > 1 and cfg.k > max_k:
        log.warning(
            "%d images support at most %d classes (requested %d); "
            "the reference would abort here (Optimiser.cpp:345-354)",
            len(thu), max_k, cfg.k)
    # Database::shuffle (Config.h:53): random image order decorrelates
    # the hemisphere split from acquisition order (deterministic seed:
    # every process derives the SAME global layout, Database.cpp:235)
    rng = np.random.default_rng(cfg.seed)
    perm = rng.permutation(len(thu))
    thu = thu.select(perm)

    ctf = ctf_params(
        thu.voltage, thu.defocus_u, thu.defocus_v, thu.defocus_theta,
        thu.cs, thu.amplitude_contrast, thu.phase_shift,
    )
    init_refs = None
    if cfg.init_model:
        init_refs, _ = read_mrc(cfg.init_model)

    # SPMD mesh over all visible devices (appsrc/thunder.cpp:401-409's
    # MPI topology becomes one jax mesh; multi-host via jax.distributed)
    from thunder_tpu.parallel.distributed import default_mesh, init_multihost

    init_multihost(a.coordinator, a.num_processes, a.process_id)
    mesh = None
    if not a.no_mesh and len(jax.devices()) > 1:
        mesh = default_mesh()
        log.info("device mesh: %s", dict(mesh.shape))

    if mesh is not None and jax.process_count() > 1:
        # per-host sharded ingest: each process reads ONLY the rows its
        # devices address (the reference's per-rank chunk assignment,
        # Database.cpp:207-254,621)
        log.info("sharded ingest: %d particles total over %d processes",
                 len(thu), jax.process_count())
        loader = lambda ids: load_images(thu, cfg.par_prefix, indices=ids)
        opt = Optimiser(cfg, None, ctf, thu.group_id - 1,
                        init_refs=init_refs,
                        resume_thu=thu if not cfg.g_search else None,
                        mesh=mesh, image_loader=loader)
        log.info("process %d loaded %d local particles",
                 jax.process_index(), opt.n_local_loaded)
    else:
        log.info("loading %d particles", len(thu))
        images = load_images(thu, cfg.par_prefix)
        opt = Optimiser(cfg, images, ctf, thu.group_id - 1,
                        init_refs=init_refs,
                        resume_thu=thu if not cfg.g_search else None,
                        mesh=mesh)

    from thunder_tpu.utils.logging import RoundMetrics, check_memory

    metrics = RoundMetrics(os.path.join(out_dir, "round_metrics.jsonl"))
    n_rounds = a.max_rounds if a.max_rounds is not None else cfg.iter_max
    for i in range(n_rounds):
        rec = opt.run_round(i)
        log.info(
            "round %d: r=%d searchType=%d->%d phases=%s res=%.2fA (%.1fs)",
            i, rec["r"], rec["search_type"], rec["search_type_after"],
            rec["n_phases"], rec["res_A"], rec["elapsed_s"],
        )
        metrics.write(rec)
        check_memory(f"round {i}")
        save_round_artifacts(opt, thu, out_dir, i)
        from thunder_tpu.model import SEARCH_TYPE_STOP

        if opt.model.search_type == SEARCH_TYPE_STOP:
            log.info("search finished at round %d", i)
            break

    log.info("final full-resolution reconstruction")
    from thunder_tpu.io.mrc import write_mrc

    final = opt.final_reconstruction()
    if cfg.mode_2d:
        write_mrc(os.path.join(out_dir, "Reference_Final.mrcs"), final,
                  cfg.pixel_size, is_stack=True)
    else:
        for t in range(cfg.k):
            write_mrc(os.path.join(out_dir, f"Reference_{t:03d}_Final.mrc"),
                      final[t], cfg.pixel_size)
            for h, tag in ((0, "A"), (1, "B")):
                write_mrc(
                    os.path.join(out_dir, f"Reference_{t:03d}_{tag}_Final.mrc"),
                    np.asarray(opt.state.refs[h, t]), cfg.pixel_size,
                )

    if cfg.subtract and not cfg.mode_2d:
        log.info("signal subtraction")
        if opt._ref_mask is None:
            log.warning("subtraction requested but no mask provided; skipped")
        else:
            sub_imgs = opt.save_subtract(opt._ref_mask)
            stack_path = os.path.join(out_dir, "Subtract.mrcs")
            write_mrc(stack_path, sub_imgs, cfg.pixel_size, is_stack=True)
            from thunder_tpu.io.thu import write_thu

            sub_thu = opt.export_thu(thu)
            sub_thu.particle_path = [
                f"{i + 1}@{stack_path}" for i in range(len(sub_thu))
            ]
            write_thu(os.path.join(out_dir, "Subtract.thu"), sub_thu)

    log.info("final resolution: %.2f A",
             opt.model.res_angstrom(cfg.thres_report_fsc))
    return 0


if __name__ == "__main__":
    sys.exit(main())
