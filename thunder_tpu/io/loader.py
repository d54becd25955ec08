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

    Returns (n, size, size) float32 in internal FFT layout.  Uses the
    native multithreaded reader (io/native.py) when available, grouped
    by stack file; falls back to mmap reads.
    """
    from thunder_tpu.io import native

    if indices is None:
        indices = list(range(len(thu)))
    else:
        indices = list(indices)

    # group by stack file so each file is visited once
    per_file: dict[str, list[tuple[int, int]]] = {}
    for pos, i in enumerate(indices):
        fname, slc = parse_stack_ref(thu.particle_path[i])
        per_file.setdefault(prefix + fname, []).append(
            (pos, 0 if slc is None else slc - 1)  # @-indexing is 1-based
        )

    out = [None] * len(indices)
    use_native = native.available()
    for path, entries in per_file.items():
        slices = [s for _, s in entries]
        if path.lower().endswith(".bmp"):
            # 8-bit BMP single images (ImageFile.cpp:122-130: iSlc must
            # be 0 for BMP — a .thu addressing other slices of one BMP
            # would silently train on duplicated data)
            from thunder_tpu.io.bmp import read_bmp

            bad = [s for s in slices if s != 0]
            if bad:
                raise ValueError(
                    f"BMP stacks have a single image; {path} addressed "
                    f"with non-zero slice indices {bad[:5]}")
            img = read_bmp(path)
            imgs = [img for _ in slices]
        elif use_native:
            imgs = native.read_mrc_slices_native(path, slices)
        else:
            imgs = MrcFile(path).read_slices(slices)
        for (pos, _), img in zip(entries, imgs):
            out[pos] = img
    return np.stack(out)
