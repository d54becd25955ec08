import sys, time
import numpy as np
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax
from bench import make_dataset, _enable_compile_cache
_enable_compile_cache()
from thunder_tpu.config import ThunderConfig
from thunder_tpu.optimiser import Optimiser
from thunder_tpu.physics.ctf import ctf_params
from thunder_tpu.model import SEARCH_TYPE_GLOBAL

size = int(sys.argv[1]); n = 256
rng = np.random.default_rng(0)
vol, imgs = make_dataset(size, n, rng)
cfg = ThunderConfig(
    mode="3D", k=1, size=size, pixel_size=1.32,
    mask_radius=size*1.32/2*0.9, trans_s=3.0, init_res=12.0,
    global_search_res=8.0, sym="C1",
    m_s=10000, m_l_r=125, m_l_t=9, m_reco=100,
    ignore_res=size*1.32, trans_search_factor=0.1,
)
ctf = ctf_params(np.full(n,300e3), rng.uniform(10000,25000,n),
    rng.uniform(10000,25000,n), rng.uniform(0,np.pi,n),
    np.full(n,2.0e7), np.full(n,0.1), np.zeros(n))
opt = Optimiser(cfg, imgs, ctf, np.zeros(n,np.int64), init_refs=vol)

def sync():
    jax.block_until_ready((opt.state.par.t,))
    np.asarray(opt.state.par.score[0,0])

def stage(name, fn):
    sync(); t0 = time.time(); out = fn()
    jax.block_until_ready(jax.tree.leaves(out) or [opt.state.par.t]); sync()
    print(f"  {name:26s} {(time.time()-t0)*1e3:9.1f} ms", flush=True)
    return out

from thunder_tpu.optimiser import _reconstruct_all_h, _compare_refs
import jax.numpy as jnp
for rnd in range(2):
    print(f"--- round {rnd} ---", flush=True)
    t_round = time.time()
    rings = opt._rings()
    if opt.model.search_type == SEARCH_TYPE_GLOBAL and cfg.g_search:
        g = stage("expectation_global", lambda: opt.expectation_global(rings))
        stage("adopt_global", lambda: opt.adopt_global(g))
    ph = stage("local_phases", lambda: opt.local_phases(rings))
    print(f"    phases {ph}")
    s0 = np.asarray(opt.state.par.s0)[opt.valid]; s1 = np.asarray(opt.state.par.s1)[opt.valid]
    opt.model.set_t_vari(float(np.median(s0)), float(np.median(s1)))
    stage("refresh_sigma", lambda: opt.refresh_sigma())
    out = stage("insert", lambda: opt.reconstruct_round())
    f2,t2,r_u,gs = out
    fsc_prev = np.asarray(opt.model.fsc, np.float32)
    refs = stage("reconstruct", lambda: _reconstruct_all_h(
        f2,t2,jnp.asarray(fsc_prev),gs,cfg.pf,r_u,True,False,True,cfg.size))
    opt.state.refs = refs
    fd = stage("compare_refs", lambda: _compare_refs(refs[0],refs[1],cfg.max_r))
    opt.model.set_fsc(np.asarray(fd[0])); opt.model.update_res(cfg.thres_report_fsc)
    stage("solvent_flatten", lambda: opt.solvent_flatten(False))
    stage("recentre+remask", lambda: (opt.re_centre_img(), opt._refresh_masked()))
    opt.model.update_r(cfg.thres_cutoff_fsc); opt.model.update_search_type()
    sync()
    dt = time.time()-t_round
    print(f"  total {dt:.2f} s ({n/dt:.1f} img/s)", flush=True)
