"""Particle image loading: .thu table -> (n, size, size) stack.

Replaces Optimiser::initImg's per-rank reads (Optimiser.cpp:4608-4680):
paths are 'NNNN@stack.mrcs' (1-based slice) or plain per-particle files;
stacks are opened once and mmap-sliced.
"""

from __future__ import annotations

import numpy as np

from thunder_tpu.io.mrc import MrcFile
from thunder_tpu.io.thu import ThuTable, parse_stack_ref


def load_images(thu: ThuTable, prefix: str = "",
                indices=None) -> np.ndarray:
    """Load (a subset of) the particles named in a ThuTable.

    Returns (n, size, size) float32 in internal FFT layout.
    """
    if indices is None:
        indices = range(len(thu))
    files: dict[str, MrcFile] = {}
    out = []
    for i in indices:
        fname, slc = parse_stack_ref(thu.particle_path[i])
        path = prefix + fname
        if path not in files:
            files[path] = MrcFile(path)
        f = files[path]
        if slc is None:
            out.append(f.read_slice(0))
        else:
            out.append(f.read_slice(slc - 1))  # @-indexing is 1-based
    return np.stack(out)
