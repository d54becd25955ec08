"""Per-host sharded data ingest.

The reference's master byte-indexes the .thu and assigns each rank a
contiguous particle chunk; every rank reads ONLY its own images
(src/Database.cpp:207-254, :621).  The TPU equivalent: every process
parses the (small, text) .thu metadata, derives the SAME global
(hemi, L) layout deterministically, asks the mesh which rows its own
devices address, loads only those images from disk, and assembles the
global device arrays with jax.make_array_from_process_local_data — no
process ever materializes the full stack in host RAM.
"""

from __future__ import annotations

import numpy as np


def mesh_axis_names(mesh):
    axes = mesh.axis_names
    return ("hemi" if "hemi" in axes else None,
            "data" if "data" in axes else None)


def process_local_rows(mesh, n_img: int) -> np.ndarray:
    """(2, n_img) bool mask of the global (hemi, L) rows addressed by
    THIS process's devices under the production P(hemi, data) sharding."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    hemi_ax, data_ax = mesh_axis_names(mesh)
    sh = NamedSharding(mesh, P(hemi_ax, data_ax))
    mask = np.zeros((2, n_img), bool)
    me = jax.process_index()
    for dev, idx in sh.devices_indices_map((2, n_img)).items():
        if dev.process_index == me:
            mask[idx[0], idx[1]] = True
    return mask


def local_block(mask: np.ndarray):
    """The process's row set as a rectangular (h_slice, l_slice) block
    (contiguous device assignment makes per-process shards rectangles;
    asserted)."""
    hs = np.nonzero(mask.any(axis=1))[0]
    ls = np.nonzero(mask.any(axis=0))[0]
    h_sl = slice(hs.min(), hs.max() + 1)
    l_sl = slice(ls.min(), ls.max() + 1)
    sub = mask[h_sl, l_sl]
    if not sub.all():
        raise ValueError("process shard is not rectangular; use a mesh "
                         "with contiguous per-process device blocks")
    if mask.sum() != sub.size:
        raise ValueError("process rows not contained in one rectangle")
    return h_sl, l_sl


def assemble_global(local_arrays, mesh, global_shape):
    """Process-local (h_block, l_block, ...) numpy -> global sharded
    jax.Array under P(hemi, data)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    hemi_ax, data_ax = mesh_axis_names(mesh)
    extra = len(global_shape) - 2
    sh = NamedSharding(mesh, P(hemi_ax, data_ax, *([None] * extra)))
    return jax.make_array_from_process_local_data(sh, local_arrays,
                                                  global_shape)
