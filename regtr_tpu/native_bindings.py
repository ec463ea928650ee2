"""ctypes bindings for the native host-side preprocessing library.

Wraps native/src/regtr_native.cpp (grid subsample, radius neighbors, overlap
computation).  The library is built lazily on first use (g++, ~2s); every
function has a numpy fallback so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path

import numpy as np

_logger = logging.getLogger(__name__)
_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libregtr_native.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["sh", str(_NATIVE_DIR / "build.sh")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception as e:  # toolchain missing -> numpy fallback
            _logger.warning("native build failed (%s); using numpy fallback", e)
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:
        _logger.warning("native load failed (%s); using numpy fallback", e)
        return None

    lib.rn_grid_subsample.restype = ctypes.c_int
    lib.rn_grid_subsample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.rn_radius_neighbors.restype = None
    lib.rn_radius_neighbors.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_float, ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.rn_compute_overlap.restype = ctypes.c_int
    lib.rn_compute_overlap.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _grid_subsample_numpy(points: np.ndarray, cell: float) -> np.ndarray:
    """Pure-numpy fallback with the same contract as the native kernel:
    voxel-grid barycenters, output sorted by voxel key (semantics of
    /root/reference .../grid_subsampling.cpp:50-103)."""
    origin = np.floor(points.min(axis=0) / cell) * cell
    ijk = np.floor((points - origin) / cell).astype(np.int64)
    key = ijk[:, 0] + (ijk[:, 1] << 10) + (ijk[:, 2] << 20)
    order = np.argsort(key, kind="stable")
    uniq, inverse = np.unique(key[order], return_inverse=True)
    acc = np.zeros((len(uniq), 3), np.float64)
    cnt = np.zeros(len(uniq), np.float64)
    np.add.at(acc, inverse, points[order])
    np.add.at(cnt, inverse, 1.0)
    return (acc / cnt[:, None]).astype(np.float32)


def grid_subsample(points: np.ndarray, cell: float) -> np.ndarray:
    """(N, 3) float32 -> (M, 3) barycenters, sorted by voxel key."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    n = len(points)
    if lib is None:
        return _grid_subsample_numpy(points, cell)
    out = np.empty((n, 3), np.float32)
    m = lib.rn_grid_subsample(_fptr(points), n, cell, _fptr(out), n)
    return out[:m].copy()


def radius_neighbors(queries, supports, radius: float, k: int) -> np.ndarray:
    """(Nq, K) int32 nearest-within-radius table; shadow = len(supports)."""
    lib = _load()
    queries = np.ascontiguousarray(queries, np.float32)
    supports = np.ascontiguousarray(supports, np.float32)
    nq, ns = len(queries), len(supports)
    if lib is None:
        d = np.linalg.norm(queries[:, None] - supports[None], axis=-1)
        idx = np.argsort(d, axis=1, kind="stable")[:, :k]
        dk = np.take_along_axis(d, idx, axis=1)
        out = np.where(dk <= radius, idx, ns).astype(np.int32)
        if out.shape[1] < k:
            out = np.pad(out, ((0, 0), (0, k - out.shape[1])),
                         constant_values=ns)
        return out
    out = np.empty((nq, k), np.int32)
    lib.rn_radius_neighbors(
        _fptr(queries), nq, _fptr(supports), ns, radius, k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def compute_overlap(src, tgt, radius: float):
    """Native mutual-nearest overlap; same contract as data.overlap."""
    lib = _load()
    if lib is None:
        from .data.overlap import compute_overlap as np_overlap

        return np_overlap(src, tgt, radius)
    src = np.ascontiguousarray(src, np.float32)
    tgt = np.ascontiguousarray(tgt, np.float32)
    n_src, n_tgt = len(src), len(tgt)
    src_mask = np.zeros(n_src, np.uint8)
    tgt_mask = np.zeros(n_tgt, np.uint8)
    corr = np.empty((min(n_src, n_tgt), 2), np.int32)
    n_corr = lib.rn_compute_overlap(
        _fptr(src), n_src, _fptr(tgt), n_tgt, radius,
        src_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        tgt_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        corr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return src_mask.astype(bool), tgt_mask.astype(bool), corr[:n_corr].T.copy()
