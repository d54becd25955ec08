import sys, time
import numpy as np
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from bench import make_dataset, _enable_compile_cache
_enable_compile_cache()
from thunder_tpu.config import ThunderConfig
from thunder_tpu.optimiser import Optimiser
from thunder_tpu.physics.ctf import ctf_params
from thunder_tpu.model import SEARCH_TYPE_CTF

size, n = 128, 256
rng = np.random.default_rng(0)
vol, imgs, _ctf_cols, _quats, _trans = make_dataset(size, n, rng)
cfg = ThunderConfig(
    mode="3D", k=1, size=size, pixel_size=1.32,
    mask_radius=size*1.32/2*0.9, trans_s=3.0, init_res=12.0,
    global_search_res=8.0, sym="C1", c_search=True,
    m_s=10000, m_l_r=125, m_l_t=9, m_l_d=9, m_reco=100,
    ignore_res=size*1.32, trans_search_factor=0.1,
)
ctf = ctf_params(np.full(n,300e3), rng.uniform(10000,25000,n),
    rng.uniform(10000,25000,n), rng.uniform(0,np.pi,n),
    np.full(n,2.0e7), np.full(n,0.1), np.zeros(n))
opt = Optimiser(cfg, imgs, ctf, np.zeros(n,np.int64), init_refs=vol)
opt.model.search_type = SEARCH_TYPE_CTF   # force the CTF-search branch
print("warmup...", file=sys.stderr, flush=True)
opt.run_round(0)
t0=time.time(); rec=opt.run_round(1); dt=time.time()-t0
print("phases:", rec.get("n_phases"))
print(f"CTF-search round 128px demo-grade (mLD=9): {n/dt:.1f} img/s ({dt:.2f} s/round)")
