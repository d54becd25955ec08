from thunder_tpu.recon.reconstructor import (  # noqa: F401
    wiener_filter_t,
    balance_weights,
    finalize_reconstruction,
    reconstruct,
    symmetrize_ft,
)
