"""Typed run configuration, JSON-compatible with the reference's config
files (appsrc/thunder.cpp:119-218 readPara; key strings beside each
field in include/Optimiser.h:80-453).

``ThunderConfig.from_json`` accepts the reference's four-section layout
(Basic / Reference Mask / Subtract / Advanced / Professional) so the
demo configs (script/demo_2D.json etc.) run unmodified.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, asdict


@dataclass
class ThunderConfig:
    # --- Basic ---
    mode: str = "2D"                    # "2D" or "3D"
    g_search: bool = True               # Global Search
    l_search: bool = True               # Local Search
    c_search: bool = False              # CTF Search
    k: int = 1                          # Number of Classes
    size: int = 160                     # Size of Image
    pixel_size: float = 1.32            # Pixel Size (Angstrom)
    mask_radius: float = 80.0           # Radius of Mask on Images (Angstrom)
    trans_s: float = 10.0               # Estimated Translation (Pixel)
    init_res: float = 60.0              # Initial Resolution (Angstrom)
    global_search_res: float = 15.0     # Perform Global Search Under (Angstrom)
    sym: str = "C1"                     # Symmetry
    init_model: str = ""                # Initial Model
    db: str = "particles.thu"           # .thu file
    par_prefix: str = ""                # Path of Particles
    dst_prefix: str = "./"              # Path of Output
    core_fsc: bool = False              # Calculate FSC Using Core Region
    mask_fsc: bool = False              # Calculate FSC Using Masked Region
    par_gra: bool = False               # Particle Grading
    ref_auto_recentre: bool = True      # Auto-Recentre Reference

    # --- Reference Mask ---
    perform_mask: bool = False
    global_mask: bool = False
    mask_path: str = ""

    # --- Advanced ---
    iter_max: int = 100
    gold_standard: bool = True
    pf: int = 2
    mkb_alpha: float = 15.0
    mkb_a: float = 1.9
    # insertion kernel: "trilinear" (the reference's default,
    # RECONSTRUCTOR_TRILINEAR_KERNEL, Config.h:97) takes the fast
    # shear-sweep path; "mkb" uses the modified Kaiser-Bessel blob
    # option (Reconstructor.cpp:424-567) via the scatter path.
    # NOTE: the sweep's effective kernel uses a width-2 hat along the
    # slice-height axis (ops/insert.py), slightly wider than the
    # reference's exact trilinear scatter; it is T-consistent and
    # FSC-golden-tested, but for kernel-exact comparison against
    # reference maps use reco_kernel="mkb" (the scatter path)
    reco_kernel: str = "trilinear"
    m_s: int = 10000                    # global sampling points (3D)
    m_s_2d: int = 100                   # global sampling points (2D)
    m_l_r: int = 125                    # local rotation support (3D)
    m_l_r_2d: int = 9                   # local rotation support (2D)
    m_l_t: int = 9                      # local translation support
    m_l_d: int = 9                      # local defocus support
    m_reco: int = 100                   # poses drawn per image in reconstruction
    ignore_res: float = 200.0           # Ignore Signal Under (Angstrom)
    sclCor_res: float = 40.0            # scale-correction resolution
    thres_cutoff_fsc: float = 0.143
    thres_report_fsc: float = 0.143
    thres_sclCor_fsc: float = 0.75
    group_sig: bool = True
    group_scl: bool = False
    zero_mask: bool = True
    ctf_refine_s: float = 0.01

    # --- Professional ---
    trans_search_factor: float = 1.0
    perturb_factor_l: float = 2.0
    perturb_factor_s_global: float = 0.5
    perturb_factor_s_local: float = 0.5
    perturb_factor_s_ctf: float = 0.5
    skip_e: bool = False
    skip_m: bool = False
    skip_r: bool = False

    # --- Subtract ---
    subtract: bool = False
    centre_region: str = ""

    # --- framework extras (not in the reference config) ---
    n_threads: int = 1
    seed: int = 20260816
    # shard the padded reconstruction grids (F/T/W/C) over the mesh's
    # data axis once a grid exceeds this many MB (big-box path; the
    # reference held whole volumes per rank and broke at ~1000px boxes)
    vol_shard_min_mb: int = 512
    # bounded HBM residency: keep the original spectra (ft_ori) in HOST
    # memory and stream L-chunks per stage (the reference's per-rank
    # host-resident image store, Optimiser::allocPreCal) — enable for
    # stacks whose second device copy would not fit HBM
    host_ft_ori: bool = False
    host_ft_chunk: int = 256
    # size the residency automatically at init: compute the projected
    # per-device HBM bytes (stacks + tables + reconstruction grids) and
    # enable host_ft_ori when over budget, logging the arithmetic — the
    # reference needed no knob because its originals always lived on
    # host (Optimiser::allocPreCal, Optimiser.cpp:7991-8171)
    auto_residency: bool = True
    # per-chip HBM budget in GB; 0 = read the device's bytes_limit and
    # fall back to 16 (v5e) when the backend does not report one
    hbm_gb: float = 0.0
    save_refs_each_iter: bool = True
    save_thu_each_iter: bool = True

    @property
    def mode_2d(self) -> bool:
        return self.mode.upper() == "2D"

    @property
    def n_rot_global(self) -> int:
        return self.m_s_2d if self.mode_2d else self.m_s

    @property
    def n_rot_local(self) -> int:
        return self.m_l_r_2d if self.mode_2d else self.m_l_r

    @property
    def max_r(self) -> int:
        # size/2 - CEIL(a) with the gridding kernel's a = 1.9
        # (Model::maxR, Model.cpp:191-194)
        return self.size // 2 - 2

    def res_a2p(self, res_a: float) -> int:
        """Angstrom resolution -> integer shell index."""
        return max(1, int(self.size * self.pixel_size / res_a))

    @property
    def r_init(self) -> int:
        # AROUND(resA2P(1/initRes)) + 1 (Optimiser.cpp:316)
        return round(self.size * self.pixel_size / self.init_res) + 1

    @property
    def r_global(self) -> int:
        # the global-search band is additionally capped by the mask
        # geometry: min(res, R_GLOBAL_FACTOR * maskRadius /
        # (1 + nSym)^(1/3)), then AROUND(resA2P(.)) + 1
        # (Optimiser.cpp:298-304, R_GLOBAL_FACTOR 0.25)
        res = self.global_search_res
        try:
            from thunder_tpu.geometry.symmetry import Symmetry

            n_sym = Symmetry(self.sym).n_elements if not self.mode_2d else 0
        except Exception:
            n_sym = 0
        res = min(res, 0.25 * self.mask_radius / (1 + n_sym) ** (1 / 3))
        r = round(self.size * self.pixel_size / res) + 1
        return max(1, min(self.max_r, r))

    @property
    def r_low(self) -> int:
        """Shell below which signal is ignored (rL; Ignore Signal Under)."""
        return max(1, int(self.size * self.pixel_size / self.ignore_res))

    @staticmethod
    def from_json(path: str) -> "ThunderConfig":
        with open(path) as f:
            raw = json.load(f)
        c = ThunderConfig()
        basic = raw.get("Basic", {})
        adv = raw.get("Advanced", {})
        prof = raw.get("Professional", {})
        rmask = raw.get("Reference Mask", {})
        sub = raw.get("Subtract", {})

        def g(section, key, default):
            return section.get(key, default)

        c.n_threads = g(basic, "Number of Threads Per Process", c.n_threads)
        c.mode = g(basic, "2D or 3D Mode", c.mode)
        c.g_search = g(basic, "Global Search", c.g_search)
        c.l_search = g(basic, "Local Search", c.l_search)
        c.c_search = g(basic, "CTF Search", c.c_search)
        c.k = g(basic, "Number of Classes", c.k)
        c.size = g(basic, "Size of Image", c.size)
        c.pixel_size = g(basic, "Pixel Size (Angstrom)", c.pixel_size)
        c.mask_radius = g(basic, "Radius of Mask on Images (Angstrom)", c.mask_radius)
        c.trans_s = g(basic, "Estimated Translation (Pixel)", c.trans_s)
        c.init_res = g(basic, "Initial Resolution (Angstrom)", c.init_res)
        c.global_search_res = g(basic, "Perform Global Search Under (Angstrom)", c.global_search_res)
        c.sym = g(basic, "Symmetry", c.sym)
        c.init_model = g(basic, "Initial Model", c.init_model)
        c.db = g(basic, ".thu File Storing Paths and CTFs of Images", c.db)
        c.par_prefix = g(basic, "Path of Particles", c.par_prefix)
        c.dst_prefix = g(basic, "Path of Output", c.dst_prefix)
        c.core_fsc = g(basic, "Calculate FSC Using Core Region", c.core_fsc)
        c.mask_fsc = g(basic, "Calculate FSC Using Masked Region", c.mask_fsc)
        c.par_gra = g(basic, "Particle Grading", c.par_gra)
        c.ref_auto_recentre = g(basic, "Auto-Recentre Reference", c.ref_auto_recentre)

        c.perform_mask = g(rmask, "Perform Reference Mask", c.perform_mask)
        c.global_mask = g(rmask, "Perform Reference Mask During Global Search", c.global_mask)
        c.mask_path = g(rmask, "Provided Mask", c.mask_path)

        c.subtract = g(sub, "Subtract Masked Region Reference From Images", c.subtract)
        c.centre_region = g(sub, "Region Need to Be Centred", c.centre_region)

        c.save_refs_each_iter = g(adv, "Save Reference(s) Each Iteration", c.save_refs_each_iter)
        c.save_thu_each_iter = g(adv, "Save .thu File Each Iteration", c.save_thu_each_iter)
        c.iter_max = g(adv, "Max Number of Iteration", c.iter_max)
        c.gold_standard = g(adv, "Using Golden Standard FSC", c.gold_standard)
        c.pf = g(adv, "Padding Factor", c.pf)
        c.mkb_a = g(adv, "MKB Kernel Radius", c.mkb_a)
        c.mkb_alpha = g(adv, "MKB Kernel Smooth Factor", c.mkb_alpha)
        c.m_s = g(adv, "Number of Sampling Points for Scanning in Global Search (3D)", c.m_s)
        c.m_s_2d = g(adv, "Number of Sampling Points for Scanning in Global Search (2D)", c.m_s_2d)
        c.m_l_r = g(adv, "Number of Sampling Points of Rotation in Local Search (3D)", c.m_l_r)
        c.m_l_r_2d = g(adv, "Number of Sampling Points of Rotation in Local Search (2D)", c.m_l_r_2d)
        c.m_l_t = g(adv, "Number of Sampling Points of Translation in Local Search", c.m_l_t)
        c.m_l_d = g(adv, "Number of Sampling Points of Defocus in Local Search", c.m_l_d)
        c.m_reco = g(adv, "Number of Sampling Points Used in Reconstruction", c.m_reco)
        c.ignore_res = g(adv, "Ignore Signal Under (Angstrom)", c.ignore_res)
        c.sclCor_res = g(adv, "Correct Intensity Scale Using Signal Under (Angstrom)", c.sclCor_res)
        c.thres_cutoff_fsc = g(adv, "FSC Threshold for Cutoff Frequency", c.thres_cutoff_fsc)
        c.thres_report_fsc = g(adv, "FSC Threshold for Reporting Resolution", c.thres_report_fsc)
        c.thres_sclCor_fsc = g(adv, "FSC Threshold for Scale Correction", c.thres_sclCor_fsc)
        c.group_sig = g(adv, "Grouping when Calculating Sigma", c.group_sig)
        c.group_scl = g(adv, "Grouping when Correcting Intensity Scale", c.group_scl)
        c.zero_mask = g(adv, "Mask Images with Zero Noise", c.zero_mask)
        c.ctf_refine_s = g(adv, "CTF Refine Standard Deviation", c.ctf_refine_s)

        c.trans_search_factor = g(prof, "Translation Search Factor", c.trans_search_factor)
        c.perturb_factor_l = g(prof, "Perturbation Factor (Large)", c.perturb_factor_l)
        c.perturb_factor_s_global = g(prof, "Perturbation Factor (Small, Global)", c.perturb_factor_s_global)
        c.perturb_factor_s_local = g(prof, "Perturbation Factor (Small, Local)", c.perturb_factor_s_local)
        c.perturb_factor_s_ctf = g(prof, "Perturbation Factor (Small, CTF)", c.perturb_factor_s_ctf)
        c.skip_e = g(prof, "Skip Expectation", c.skip_e)
        c.skip_m = g(prof, "Skip Maximization", c.skip_m)
        c.skip_r = g(prof, "Skip Reconstruction", c.skip_r)
        return c

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(asdict(self), f, indent=2)
