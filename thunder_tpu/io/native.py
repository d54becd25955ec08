"""ctypes bridge to the native IO runtime (native/io/thunder_io.cpp).

Builds lazily on first use (g++ via the Makefile) and falls back to the
pure-numpy readers when the toolchain or library is unavailable; the
public API is identical either way.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native", "io")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libthunder_io.so")

_lib = None
_tried = False


class _MrcInfo(ctypes.Structure):
    _fields_ = [
        ("nx", ctypes.c_int32), ("ny", ctypes.c_int32),
        ("nz", ctypes.c_int32), ("mode", ctypes.c_int32),
        ("mx", ctypes.c_int32), ("my", ctypes.c_int32),
        ("mz", ctypes.c_int32),
        ("cella_x", ctypes.c_float), ("cella_y", ctypes.c_float),
        ("cella_z", ctypes.c_float), ("nsymbt", ctypes.c_int32),
    ]


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.thu_count.restype = ctypes.c_long
        lib.thu_count.argtypes = [ctypes.c_char_p]
        lib.thu_parse.restype = ctypes.c_long
        lib.thu_parse.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_char_p,
            ctypes.c_long,
        ]
        lib.mrc_open.restype = ctypes.c_int
        lib.mrc_open.argtypes = [ctypes.c_char_p, ctypes.POINTER(_MrcInfo)]
        lib.mrc_read_slices.restype = ctypes.c_int
        lib.mrc_read_slices.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def read_thu_native(path: str):
    """Fast .thu parse -> ThuTable, or None if native lib unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = lib.thu_count(path.encode())
    if n < 0:
        raise FileNotFoundError(path)
    if n == 0:
        from thunder_tpu.io.thu import ThuTable

        return ThuTable.blank(0)
    numeric = np.zeros((n, 25), dtype=np.float64)
    paths_cap = os.path.getsize(path) + 2 * n + 16
    paths_buf = ctypes.create_string_buffer(paths_cap)
    rows = lib.thu_parse(
        path.encode(),
        numeric.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        paths_buf, paths_cap,
    )
    if rows != n:
        raise ValueError(f"{path}: native parse failed (rows={rows})")

    # unpack the packed path strings: particle, micrograph per row
    raw = paths_buf.raw
    strs = []
    ofs = 0
    for _ in range(2 * n):
        end = raw.index(b"\x00", ofs)
        strs.append(raw[ofs:end].decode())
        ofs = end + 1
    p_paths = strs[0::2]
    m_paths = strs[1::2]

    from thunder_tpu.io.thu import ThuTable

    c = numeric  # columns ordered as file order minus the two paths
    return ThuTable(
        voltage=c[:, 0], defocus_u=c[:, 1], defocus_v=c[:, 2],
        defocus_theta=c[:, 3], cs=c[:, 4], amplitude_contrast=c[:, 5],
        phase_shift=c[:, 6], particle_path=p_paths, micrograph_path=m_paths,
        coord_x=c[:, 7], coord_y=c[:, 8],
        group_id=c[:, 9].astype(np.int64), class_id=c[:, 10].astype(np.int64),
        quat=c[:, 11:15].copy(), k1=c[:, 15], k2=c[:, 16], k3=c[:, 17],
        trans=c[:, 18:20].copy(), std_trans=c[:, 20:22].copy(),
        defocus_factor=c[:, 22], std_defocus_factor=c[:, 23], score=c[:, 24],
    )


def read_mrc_slices_native(path: str, indices, shift: bool = True,
                           n_threads: int = 8) -> np.ndarray | None:
    """Multithreaded native stack read, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    info = _MrcInfo()
    rc = lib.mrc_open(path.encode(), ctypes.byref(info))
    if rc != 0:
        raise IOError(f"mrc_open({path}) failed: {rc}")
    idx = np.ascontiguousarray(np.asarray(indices, dtype=np.int64))
    out = np.empty((len(idx), info.ny, info.nx), dtype=np.float32)
    rc = lib.mrc_read_slices(
        path.encode(),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        len(idx),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        1 if shift else 0,
        n_threads,
    )
    if rc != 0:
        raise IOError(f"mrc_read_slices({path}) failed: {rc}")
    return out
