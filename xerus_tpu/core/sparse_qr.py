"""ctypes bridge to the native sparse QR (native/sparseqr.cpp).

SPQR-parity for the reference's sparse factorization paths
(src/xerus/cholmod_wrapper.cpp:178-266, consumed by tensor.cpp:1495-1570):
sparse-in/sparse-out thin QR with Heath-style rank detection.  Auto-builds
the shared library on first use; callers fall back to the dense path when
the library is unavailable (mirroring the reference's own sparse-RQ dense
fallback, tensor.cpp:1516-1523).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libsparseqr.so")

_I64P = ctypes.POINTER(ctypes.c_int64)
_F64P = ctypes.POINTER(ctypes.c_double)


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    # always invoke make (timestamp-based, cheap): a stale .so from an
    # older source or another machine must never be used silently
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        if not os.path.exists(_SO_PATH):
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.sqr_factor.restype = ctypes.c_void_p
        lib.sqr_factor.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_int64, _I64P, _I64P, _F64P,
                                   ctypes.c_double]
        for name in ("sqr_rank", "sqr_q_nnz", "sqr_r_nnz"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_void_p]
        for name in ("sqr_get_q", "sqr_get_r"):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [ctypes.c_void_p, _I64P, _I64P, _F64P]
        lib.sqr_free.restype = None
        lib.sqr_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def _as_i64p(a: np.ndarray):
    return a.ctypes.data_as(_I64P)


def _as_f64p(a: np.ndarray):
    return a.ctypes.data_as(_F64P)


def sparse_qc(pos: np.ndarray, vals: np.ndarray, m: int, n: int,
              rel_tol: float
              ) -> Optional[Tuple[Dict[int, float], Dict[int, float], int]]:
    """Factor the m x n matrix with flat-position COO data ``pos/vals`` as
    A = Q C (Q: m x r orthonormal columns, C: r x n), rank-revealed with
    ``rel_tol`` (|R_jj| >= rel_tol * max diag kept; 0 = structural only).
    Returns (q_flat_dict, c_flat_dict, rank), or None when the native
    library is missing or the matrix is numerically empty."""
    lib = _load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, dtype=np.int64)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    rows = pos // n
    cols = pos % n
    h = lib.sqr_factor(m, n, pos.size, _as_i64p(rows), _as_i64p(cols),
                       _as_f64p(vals), float(rel_tol))
    if not h:
        return None
    try:
        rank = lib.sqr_rank(h)
        if rank == 0:
            return None
        qn, rn = lib.sqr_q_nnz(h), lib.sqr_r_nnz(h)
        qr_ = np.empty(qn, np.int64)
        qc_ = np.empty(qn, np.int64)
        qv = np.empty(qn, np.float64)
        rr = np.empty(rn, np.int64)
        rc = np.empty(rn, np.int64)
        rv = np.empty(rn, np.float64)
        lib.sqr_get_q(h, _as_i64p(qr_), _as_i64p(qc_), _as_f64p(qv))
        lib.sqr_get_r(h, _as_i64p(rr), _as_i64p(rc), _as_f64p(rv))
    finally:
        lib.sqr_free(h)
    q = dict(zip((qr_ * rank + qc_).tolist(), qv.tolist()))
    c = dict(zip((rr * n + rc).tolist(), rv.tolist()))
    return q, c, int(rank)


def sparse_solve_ls(pos: np.ndarray, vals: np.ndarray, m: int, n: int,
                    b: np.ndarray, rel_tol: float) -> Optional[np.ndarray]:
    """Least-squares/basic solve of the sparse m x n system A x ~= b via the
    native QR — the reference's SuiteSparseQR(ordering, EPSILON, A, b) solve
    (cholmod_wrapper.cpp:173-225): factor A = Q C, then back-substitute
    C x = Q^T b over the kept columns (dead columns get x = 0, SPQR's basic
    solution).  Returns None when the native library is unavailable."""
    out = sparse_qc(pos, vals, m, n, rel_tol)
    if out is None:
        return None
    q_flat, c_flat, rank = out
    b = np.asarray(b, dtype=np.float64).reshape(m)
    y = np.zeros(rank, np.float64)
    for p, v in q_flat.items():                    # y = Q^T b
        y[p % rank] += v * b[p // rank]
    crows: list = [[] for _ in range(rank)]
    for p, v in c_flat.items():
        crows[p // n].append((p % n, v))
    for row in crows:
        row.sort()
    x = np.zeros(n, np.float64)
    for k in range(rank - 1, -1, -1):
        lead_col, lead_val = crows[k][0]
        acc = y[k]
        for col, v in crows[k][1:]:
            acc -= v * x[col]
        x[lead_col] = acc / lead_val
    return x


def sparse_cq(pos: np.ndarray, vals: np.ndarray, m: int, n: int,
              rel_tol: float
              ) -> Optional[Tuple[Dict[int, float], Dict[int, float], int]]:
    """A = C Q (C: m x r, Q: r x n orthonormal rows) via QC of the
    transpose (the reference's trick, cholmod_wrapper.cpp:255-266)."""
    rows = pos // n
    cols = pos % n
    t_pos = cols * m + rows            # transpose: (n x m) flat positions
    out = sparse_qc(t_pos, vals, n, m, rel_tol)
    if out is None:
        return None
    qt, ct, rank = out                 # A^T = Q' C'  ->  A = C'^T Q'^T
    # C = C'^T: (m x rank) from ct (rank x m); Q = Q'^T: (rank x n) from qt
    c = {(p % m) * rank + (p // m): v for p, v in ct.items()}
    q = {(p % rank) * n + (p // rank): v for p, v in qt.items()}
    return c, q, rank
