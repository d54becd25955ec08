"""Algorithmic constants.

Each constant mirrors a compile-time default of the reference build
(values verified against /root/reference include/ headers; citations in
comments are reference file:line).  Only variants that the reference
enables by default (include/Config.h) are kept; the rebuild does not
reproduce the ~120-flag variant matrix.
"""

import math

# --- particle filter (include/Particle.h:52-64) ---
PEAK_FACTOR_MAX = 0.5
PEAK_FACTOR_MIN = 1e-3
PEAK_FACTOR_C = 1 - 1e-2
PEAK_FACTOR_BASE = 2
RHO_MAX = 1 - 1e-1
RHO_MIN = -1 + 1e-1
PERTURB_K_MAX = 1.0

# --- expectation phase loop (include/Optimiser.h:56-67) ---
MIN_N_PHASE_PER_ITER_GLOBAL = 10
MIN_N_PHASE_PER_ITER_LOCAL = 3
MAX_N_PHASE_PER_ITER = 100
N_PHASE_WITH_NO_VARI_DECREASE = 1
TRANS_Q = 0.05

# --- reconstructor gridding balance loop (include/Reconstructor.h:61-75) ---
MIN_N_ITER_BALANCE = 10
MAX_N_ITER_BALANCE = 30
DIFF_C_THRES = 1e-2
DIFF_C_DECREASE_THRES = 0.95
N_DIFF_C_NO_DECREASE = 2
WIENER_FACTOR_MIN_R = 5
FSC_BASE_L = 1e-3
FSC_BASE_H = 1 - 1e-3
T_MIN = 1e-25          # floor on T before W iteration (Reconstructor.cpp:1322)
C_ABS_MIN = 1e-6       # floor on |C| in W update (Reconstructor.cpp:1466)

# --- soft edges (include/Macro.h:94-99) ---
EDGE_WIDTH_FT = 4
EDGE_WIDTH_RL = 6

# --- default gridding kernel parameters (include/Optimiser.h:434-436) ---
DEFAULT_PF = 2           # padding factor
DEFAULT_MKB_A = 1.9      # MKB blob radius
DEFAULT_MKB_ALPHA = 15.0 # MKB smoothness

# --- FSC thresholds (include/Optimiser.h:437-439) ---
FSC_CUTOFF = 0.143
FSC_REPORT = 0.143
FSC_SCALE = 0.75

# --- CTF (src/CTF.cpp:18) ---
# electron wavelength [Å] = CTF_LAMBDA_A / sqrt(V (1 + V * CTF_LAMBDA_B))
CTF_LAMBDA_A = 12.2643247
CTF_LAMBDA_B = 0.978466e-6

# --- model / resolution state machine (src/Model.cpp, include/Model.h) ---
MAX_ITER_RES_NO_IMPROVE = 2   # rounds w/o top-res improvement before moving on
INIT_OUTSIDE_CONFIDENCE_AREA = 0.5
TRANS_SEARCH_FACTOR_DEFAULT = 1.0
MIN_N_TRANSLATION_GLOBAL = 30  # Optimiser.cpp:661 GSL_MAX_INT(30, ...)

# --- misc ---
TWO_PI = 2.0 * math.pi
