"""ctypes bindings for the native ingestion helpers (``ingest.cc``).

Loads ``libingest.so`` if present (``make -C gnnflow_tpu/csrc``); falls
back to NumPy implementations otherwise, so the package works without a
compile step.  The build is attempted automatically once per process.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libingest.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _HERE], capture_output=True,
                           timeout=120, check=True)
        except Exception as e:  # no toolchain / build failure -> numpy
            logging.debug("native ingest build failed: %s", e)
    if os.path.exists(_LIB_PATH):
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.group_sort_edges.argtypes = [
                ctypes.c_int64,
                np.ctypeslib.ndpointer(np.int64, flags="C"),
                np.ctypeslib.ndpointer(np.float32, flags="C"),
                np.ctypeslib.ndpointer(np.int64, flags="C")]
            lib.ranged_lower_bound.argtypes = [
                ctypes.c_int64,
                np.ctypeslib.ndpointer(np.float32, flags="C"),
                np.ctypeslib.ndpointer(np.int64, flags="C"),
                np.ctypeslib.ndpointer(np.int64, flags="C"),
                np.ctypeslib.ndpointer(np.float32, flags="C"),
                np.ctypeslib.ndpointer(np.int64, flags="C")]
            lib.resort_range.argtypes = [
                ctypes.c_int64, ctypes.c_int64,
                np.ctypeslib.ndpointer(np.float32, flags="C"),
                np.ctypeslib.ndpointer(np.int32, flags="C"),
                np.ctypeslib.ndpointer(np.int32, flags="C")]
            _lib = lib
        except OSError as e:
            logging.debug("native ingest load failed: %s", e)
    return _lib


def have_native() -> bool:
    return _load() is not None


def group_sort_edges(src: np.ndarray, ts: np.ndarray) -> np.ndarray:
    """Stable argsort by (src, ts) — the ingestion grouping sort."""
    lib = _load()
    n = len(src)
    if lib is None or n == 0:
        return np.lexsort((ts, src))
    src = np.ascontiguousarray(src, dtype=np.int64)
    ts = np.ascontiguousarray(ts, dtype=np.float32)
    out = np.empty(n, dtype=np.int64)
    lib.group_sort_edges(n, src, ts, out)
    return out


def ranged_lower_bound(pool_ts: np.ndarray, off: np.ndarray,
                       lengths: np.ndarray,
                       target: np.ndarray) -> np.ndarray:
    """Per-range binary search (eviction threshold lookup)."""
    lib = _load()
    n = len(off)
    if lib is None or n == 0:
        lo = np.zeros(n, dtype=np.int64)
        hi = lengths.astype(np.int64).copy()
        while (lo < hi).any():
            mid = (lo + hi) // 2
            go = pool_ts[off + np.minimum(mid, lengths - 1)] < target
            act = lo < hi
            lo = np.where(act & go, mid + 1, lo)
            hi = np.where(act & ~go, mid, hi)
        return lo
    out = np.empty(n, dtype=np.int64)
    lib.ranged_lower_bound(
        n, np.ascontiguousarray(pool_ts, np.float32),
        np.ascontiguousarray(off, np.int64),
        np.ascontiguousarray(lengths, np.int64),
        np.ascontiguousarray(np.broadcast_to(target, (n,)), np.float32),
        out)
    return out


def resort_range(pool_ts: np.ndarray, pool_dst: np.ndarray,
                 pool_eid: np.ndarray, off: int, length: int) -> None:
    """Stable ts re-sort of one vertex range, in place."""
    lib = _load()
    if lib is not None and pool_ts.flags["C_CONTIGUOUS"] \
            and pool_dst.dtype == np.int32 and pool_eid.dtype == np.int32:
        lib.resort_range(off, length, pool_ts, pool_dst, pool_eid)
        return
    sl = slice(off, off + length)
    perm = np.argsort(pool_ts[sl], kind="stable")
    pool_ts[sl] = pool_ts[sl][perm]
    pool_dst[sl] = pool_dst[sl][perm]
    pool_eid[sl] = pool_eid[sl][perm]
