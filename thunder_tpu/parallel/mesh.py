"""Device mesh construction + canonical shardings.

The reference's process topology (src/Parallel.cpp:17-67) — master rank,
hemisphere A = odd ranks, hemisphere B = even ranks, chunked >2GB
MPI_Allreduce_Large collectives (Parallel.cpp:158-347), plus NCCL
reductions inside a node on the GPU path (gpu/src/cuthunder.cu:297-345)
— maps onto ONE jax mesh with axes ``("hemi", "data")``:

  * hemi axis (size 2): the golden-standard split.  Each half of the
    mesh holds its own references, sigma and particle chunk; the two
    halves only meet in the FSC/averaging step (Model.cpp:375-389's
    lead->master ssend/recv becomes a cross-half collective inside
    ``Optimiser._reconstruct_and_compare``).
  * data axis: particle images are sharded; the F/T accumulator sums
    become psum over "data" (XLA lowers to ICI all-reduce; both the
    MPI and the NCCL tier of the reference collapse into this one
    collective).
  * the master *process* disappears: round-level control runs on host.

The production SPMD path is ``thunder_tpu.optimiser.Optimiser(mesh=...)``
— every hot stage there is a hemi-stacked jitted program whose inputs
carry these shardings.  This module only builds the mesh and the
placements.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, hemi: int = 2) -> Mesh:
    """Mesh with axes (hemi, data).  hemi=2 for golden standard; the
    remaining devices form the data axis."""
    devices = np.asarray(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % hemi != 0:
        raise ValueError(f"{n} devices not divisible by hemi={hemi}")
    return Mesh(devices.reshape(hemi, n // hemi), axis_names=("hemi", "data"))


def hemi_data_sharding(mesh: Mesh, extra_dims: int = 0) -> NamedSharding:
    """Sharding for arrays (hemi, L, ...): hemi over hemi, L over data."""
    return NamedSharding(mesh, P("hemi", "data", *([None] * extra_dims)))


def replicated_per_hemi(mesh: Mesh, extra_dims: int = 0) -> NamedSharding:
    """Sharding for per-hemisphere state (hemi, ...): replicated along data."""
    return NamedSharding(mesh, P("hemi", *([None] * extra_dims)))
