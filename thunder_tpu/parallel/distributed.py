"""Multi-host bring-up helpers.

The reference launches N MPI ranks per node and wires them into
master/hemi-A/hemi-B communicators (src/Parallel.cpp).  On TPU pods the
equivalent is `jax.distributed.initialize()` (one process per host,
devices discovered automatically) and a global mesh; DCN transfers are
handled by the runtime, so nothing like MPI_*_Large chunking is needed
(Parallel.h:37's 2GB chunking exists only because of MPI's int counts).
"""

from __future__ import annotations

import logging

log = logging.getLogger("thunder.SYS")


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> int:
    """Initialize the jax distributed runtime when running on more than
    one host.  On a single host this is a no-op.  Returns the number of
    global devices."""
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        log.info("jax.distributed initialized: process %s/%s",
                 process_id, num_processes)
    n = len(jax.devices())
    log.info("global devices: %d", n)
    return n


def default_mesh(hemi: int = 2):
    """The standard (hemi, data) mesh over all global devices; falls
    back to a data-only mesh when fewer than 2*hemi devices exist."""
    import numpy as np
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    if len(devices) >= hemi and len(devices) % hemi == 0:
        return Mesh(devices.reshape(hemi, -1), axis_names=("hemi", "data"))
    return Mesh(devices, axis_names=("data",))
