import sys, time
import numpy as np
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from bench import _enable_compile_cache
_enable_compile_cache()
from thunder_tpu.config import ThunderConfig
from thunder_tpu.optimiser import Optimiser
from thunder_tpu.physics.ctf import ctf_params

size, n, k = 160, 2048, 10
rng = np.random.default_rng(0)
imgs = rng.standard_normal((n, size, size)).astype(np.float32)
cfg = ThunderConfig(
    mode="2D", k=k, size=size, pixel_size=1.32,
    mask_radius=size*1.32/2*0.85, trans_s=5.0,
    init_res=25.0, global_search_res=15.0, sym="C1",
    m_s_2d=100, m_l_r_2d=9, m_l_t=9, m_reco=100,
    ignore_res=size*1.32, trans_search_factor=0.25,
)
ctf = ctf_params(np.full(n,300e3), rng.uniform(10000,25000,n),
    rng.uniform(10000,25000,n), rng.uniform(0,np.pi,n),
    np.full(n,2.0e7), np.full(n,0.1), np.zeros(n))
opt = Optimiser(cfg, imgs, ctf, np.zeros(n,np.int64))
print("warmup...", file=sys.stderr, flush=True)
opt.run_round(0)
t0=time.time(); opt.run_round(1); dt=time.time()-t0
print(f"2D classify 160px K={k} n={n} (demo grid mS=100 mLR=9 mLT=9 mReco=100): {n/dt:.1f} img/s ({dt:.2f} s/round)")
