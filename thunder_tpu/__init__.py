"""thunder_tpu — a TPU-native particle-filter framework for cryo-EM
single-particle 3D reconstruction.

A ground-up JAX/XLA/Pallas re-design of the capabilities of THUNDER
(Hu et al., Nature Methods 2018; reference C++/CUDA tree at
/root/reference): 2D classification, 3D classification and 3D
auto-refinement of noisy particle images by sequential importance
resampling over a 5D latent space (class, rotation, translation,
defocus) per image.

Design stance (vs the reference):
  * the E-step pose search is a batched MXU einsum over packed Fourier
    pixel rings (replaces hand-written AVX512 / CUDA likelihood kernels)
  * Fourier-slice projection is a batched trilinear gather on a padded,
    grid-corrected spectrum (replaces Projector.cpp)
  * backprojection is a deterministic scatter-add + iterative gridding
    normalization (replaces Reconstructor.cpp + MPI_Allreduce_Large)
  * the MPI master/hemisphere-A/B process topology becomes a
    ``jax.sharding.Mesh`` with axes ``("hemi", "data")``; psum over
    ``data`` replaces NCCL+MPI two-level reductions, host-side logic
    replaces the master rank.
"""

__version__ = "0.1.0"

from thunder_tpu import constants  # noqa: F401


def __getattr__(name):
    # lazy public API (avoids importing jax at package-import time)
    if name == "Optimiser":
        from thunder_tpu.optimiser import Optimiser

        return Optimiser
    if name == "ThunderConfig":
        from thunder_tpu.config import ThunderConfig

        return ThunderConfig
    if name == "Symmetry":
        from thunder_tpu.geometry.symmetry import Symmetry

        return Symmetry
    raise AttributeError(name)
