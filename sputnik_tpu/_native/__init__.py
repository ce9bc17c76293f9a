"""ctypes loader for the native topology builder (compiles on demand).

``lib()`` returns the loaded shared library or ``None`` (numpy fallbacks in
``topology.py`` / ``blocking.py`` then apply — results are bit-identical,
asserted by ``tests/test_native.py``). Set ``SPUTNIK_TPU_NO_NATIVE=1`` to
force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "topology.c")

_lock = threading.Lock()
_lib = None
_tried = False


def _src_hash() -> str:
    import hashlib

    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def _so_path() -> str:
    """Cache path keyed by source hash — a read-only install still gets a
    working build (user cache dir), and a source change never reuses a
    stale artifact."""
    cache = os.environ.get("XDG_CACHE_HOME",
                           os.path.join(os.path.expanduser("~"), ".cache"))
    d = os.path.join(cache, "sputnik_tpu")
    return os.path.join(d, f"_topology_{sys.platform}_{_src_hash()}.so")


def _build(so: str) -> bool:
    """Compile to a temp file then ``os.replace`` — atomic against a
    concurrent first-use in another process (no partially-written .so can
    ever be dlopened)."""
    os.makedirs(os.path.dirname(so), exist_ok=True)
    tmp = f"{so}.tmp.{os.getpid()}"
    for cc in ("cc", "gcc", "clang"):
        try:
            r = subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", _SRC, "-o", tmp],
                capture_output=True, timeout=120,
            )
            if r.returncode == 0:
                os.replace(tmp, so)
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
        finally:
            if os.path.exists(tmp):
                try:
                    os.remove(tmp)
                except OSError:
                    pass
    return False


def lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("SPUTNIK_TPU_NO_NATIVE"):
            return None
        try:
            so = _so_path()
        except OSError:
            return None
        if not os.path.exists(so):
            try:
                if not _build(so):
                    return None
            except OSError:
                return None
        try:
            L = ctypes.CDLL(so)
        except OSError:
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        L.count_nnz_f32.restype = ctypes.c_int64
        L.count_nnz_f32.argtypes = [f32p, ctypes.c_int64]
        L.csr_from_dense_f32.restype = ctypes.c_int64
        L.csr_from_dense_f32.argtypes = [
            f32p, ctypes.c_int32, ctypes.c_int32, i32p, i32p, f32p]
        L.transpose_perm.restype = None
        L.transpose_perm.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int32, i32p, i32p, i32p]
        L.block_build.restype = ctypes.c_int32
        L.block_build.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p,
            ctypes.c_void_p, i32p, ctypes.c_void_p]
        L.expand_row_ids.restype = None
        L.expand_row_ids.argtypes = [i32p, ctypes.c_int32, i32p]
        _lib = L
        return _lib


# -- numpy-facing wrappers ---------------------------------------------------


def csr_from_dense(mat: np.ndarray):
    """float32 [m, n] -> (values, row_offsets, col_indices) or None."""
    L = lib()
    if L is None:
        return None
    mat = np.ascontiguousarray(mat, np.float32)
    m, n = mat.shape
    nnz = int(L.count_nnz_f32(mat.reshape(-1), mat.size))
    ro = np.empty(m + 1, np.int32)
    ci = np.empty(max(nnz, 1), np.int32)
    vals = np.empty(max(nnz, 1), np.float32)
    L.csr_from_dense_f32(mat.reshape(-1), m, n, ro, ci, vals)
    return vals[:nnz], ro, ci[:nnz]


def transpose_perm(rows: np.ndarray, cols: np.ndarray, n: int):
    """COO (CSR-ordered) -> (ro_t, ci_t, perm) or None."""
    L = lib()
    if L is None:
        return None
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    nnz = len(rows)
    ro_t = np.empty(n + 1, np.int32)
    ci_t = np.empty(max(nnz, 1), np.int32)
    perm = np.empty(max(nnz, 1), np.int32)
    L.transpose_perm(rows, cols, nnz, n, ro_t, ci_t, perm)
    return ro_t, ci_t[:nnz], perm[:nnz]


def block_build(rows: np.ndarray, cols: np.ndarray, bm: int, bk: int,
                mb: int, kb: int):
    """-> (nblocks, block_cols [mb, max_bpr], scatter [nnz], max_bpr)
    or None."""
    L = lib()
    if L is None:
        return None
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    nnz = len(rows)
    nblocks = np.empty(mb, np.int32)
    slot_of = np.empty(mb * kb, np.int32)
    max_bpr = int(L.block_build(rows, cols, nnz, bm, bk, mb, kb, 0,
                                nblocks, None, slot_of, None))
    block_cols = np.empty((mb, max_bpr), np.int32)
    scatter = np.empty(max(nnz, 1), np.int32)
    L.block_build(rows, cols, nnz, bm, bk, mb, kb, max_bpr, nblocks,
                  block_cols.ctypes.data_as(ctypes.c_void_p), slot_of,
                  scatter.ctypes.data_as(ctypes.c_void_p))
    return nblocks, block_cols, scatter[:nnz], max_bpr


def expand_row_ids(row_offsets: np.ndarray, m: int, nnz: int):
    L = lib()
    if L is None:
        return None
    ro = np.ascontiguousarray(row_offsets, np.int32)
    out = np.empty(max(nnz, 1), np.int32)
    L.expand_row_ids(ro, m, out)
    return out[:nnz]
