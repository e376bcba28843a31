"""ctypes bindings for the native host data-loader (lshm_tpu/native/patchio.cpp).

Builds the shared library on first import if missing (g++, no pybind11 needed); all
callers must gracefully fall back to the numpy path when the toolchain is absent —
check ``available()`` first.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libpatchio.so")
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR, "libpatchio.so"],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.decode_patchify.restype = ctypes.c_int
    lib.decode_patchify.argtypes = [
        ctypes.POINTER(ctypes.c_int8),   # vis
        ctypes.POINTER(ctypes.c_float),  # scales
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,  # nb,ntime,nfreq,npol
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,              # pols, npols_sel
        ctypes.c_int, ctypes.c_float,                            # patch, clamp
        ctypes.POINTER(ctypes.c_float),                          # out
        ctypes.POINTER(ctypes.c_double),                         # stats[2]
    ]
    lib.normalize_inplace.restype = None
    lib.normalize_inplace.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.c_double, ctypes.c_double,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_patchify(
    vis: np.ndarray,          # [nb, ntime, nfreq, npol, 2] int8 (contiguous)
    scales: np.ndarray,       # [nb, nfreq, npol] float32
    pols: tuple[int, ...],
    patch: int,
    clamp: float,
    normalize: bool = True,
) -> tuple[np.ndarray, tuple[int, int]]:
    """Fused decode+patchify: returns ([nb*px*py, patch, patch, 2*len(pols)], (px, py))."""
    lib = _load()
    assert lib is not None, "native patchio unavailable"
    vis = np.ascontiguousarray(vis, np.int8)
    scales = np.ascontiguousarray(scales, np.float32)
    nb, ntime, nfreq, npol, _ = vis.shape
    stride = patch // 2
    px = (max(ntime, patch) - patch) // stride + 1
    py = (max(nfreq, patch) - patch) // stride + 1
    C = 2 * len(pols)
    out = np.empty((nb * px * py, patch, patch, C), np.float32)
    stats = np.zeros(2, np.float64)
    pols_arr = np.asarray(pols, np.int32)
    rc = lib.decode_patchify(
        vis.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nb, ntime, nfreq, npol,
        pols_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(pols),
        patch, ctypes.c_float(clamp),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        stats.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    assert rc == 0, "decode_patchify failed"
    if normalize:
        lib.normalize_inplace(
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_long(out.size),
            ctypes.c_double(float(stats[0])), ctypes.c_double(float(stats[1])),
        )
    return out, (px, py)
