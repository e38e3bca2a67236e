"""ctypes bridge to the native sparse QR (native/sparseqr.cpp).

SPQR-parity for the reference's sparse factorization paths
(src/xerus/cholmod_wrapper.cpp:178-266, consumed by tensor.cpp:1495-1570):
sparse-in/sparse-out thin QR with Heath-style rank detection, with a
fill-reducing column preordering stage standing in for SPQR's COLAMD
(cholmod_wrapper.h:44-100).  Auto-builds the shared library on first use;
callers fall back to the dense path when the library is unavailable
(mirroring the reference's own sparse-RQ dense fallback,
tensor.cpp:1516-1523).
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

# Fill-reducing column preorder (native/sparseqr.cpp column_order):
# 0 natural, 1 ascending column count (George-Heath's recommendation),
# 2 greedy min-degree on the A^T A column-intersection graph.  Default is
# measured in benchmarks/sparseqr_scale.py (doc/performance.md).
DEFAULT_ORDERING = int(os.environ.get("XERUS_TPU_SPARSEQR_ORDERING", "1"))


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
        lib.sqr_factor_ord.restype = ctypes.c_void_p
        lib.sqr_factor_ord.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_int64, _I64P, _I64P, _F64P,
                                       ctypes.c_double, ctypes.c_int64]
        for name in ("sqr_rank", "sqr_q_nnz", "sqr_r_nnz"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_void_p]
        for name in ("sqr_get_q", "sqr_get_r"):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [ctypes.c_void_p, _I64P, _I64P, _F64P]
        lib.sqr_get_pivots.restype = None
        lib.sqr_get_pivots.argtypes = [ctypes.c_void_p, _I64P]
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


def _factor_raw(pos: np.ndarray, vals: np.ndarray, m: int, n: int,
                rel_tol: float, ordering: Optional[int] = None):
    """Factor and extract raw COO arrays.  Returns
    (q_rows, q_cols, q_vals, r_rows, r_cols, r_vals, rank, pivots) or
    None.  ``pivots[k]`` is the ORIGINAL column id of row k's pivot —
    under a fill-reducing ordering R is triangular in elimination order,
    not in original column order."""
    lib = _load()
    if lib is None:
        return None
    if ordering is None:
        ordering = DEFAULT_ORDERING
    pos = np.ascontiguousarray(pos, dtype=np.int64)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    rows = pos // n
    cols = pos % n
    h = lib.sqr_factor_ord(m, n, pos.size, _as_i64p(rows), _as_i64p(cols),
                           _as_f64p(vals), float(rel_tol), int(ordering))
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
        piv = np.empty(rank, np.int64)
        lib.sqr_get_q(h, _as_i64p(qr_), _as_i64p(qc_), _as_f64p(qv))
        lib.sqr_get_r(h, _as_i64p(rr), _as_i64p(rc), _as_f64p(rv))
        lib.sqr_get_pivots(h, _as_i64p(piv))
    finally:
        lib.sqr_free(h)
    return qr_, qc_, qv, rr, rc, rv, int(rank), piv


def mean_row_span(pos: np.ndarray, m: int, n: int) -> float:
    """Mean column span (max - min + 1) of the occupied rows — the fill
    predictor of the Givens elimination: fill stays within the row
    profile, so small spans (banded/structured patterns, the regime TT
    sparse cores live in) keep R sparse, while wide rows clique their
    whole span into A^T A and fill explodes under EVERY ordering
    (measured: random-scatter fill saturates at the same value for
    natural/colcount/mindeg, benchmarks/sparseqr_ordering.json)."""
    if not pos.size:
        return 0.0
    rows = pos // n
    cols = pos % n
    order = np.argsort(rows, kind="stable")
    rows_s, cols_s = rows[order], cols[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(rows_s)) + 1])
    spans = (np.maximum.reduceat(cols_s, starts)
             - np.minimum.reduceat(cols_s, starts) + 1)
    return float(spans.mean())


# Measured dispatch boundary (benchmarks/sparseqr_scale.json +
# sparseqr_ordering.json): the native kernel wins exactly on
# narrow-profile patterns (banded bandwidth <= 8: 122-2745x faster than
# LAPACK, fill ~2.6x nnz); at bandwidth ~32 or random scatter it pays
# dense-QR flops with scalar bookkeeping (6-135x slower), and no column
# ordering changes that (fill is intrinsic to the A^T A cliques).  SPQR's
# own answer is dense BLAS3 frontal kernels; ours is the dense-Heath
# route below — same rank rule, LAPACK speed.
ROW_SPAN_NATIVE_LIMIT = float(os.environ.get(
    "XERUS_TPU_SPARSEQR_SPAN_LIMIT", "16"))


def dense_heath_qc(pos: np.ndarray, vals: np.ndarray, m: int, n: int,
                   rel_tol: float
                   ) -> Tuple[Dict[int, float], Dict[int, float], int]:
    """Dense-kernel QC with the native path's EXACT rank semantics: LAPACK
    Householder QR, then the same Heath dead-column cascade the Givens
    code runs (zero the tiny pivot, re-eliminate the row remainder with
    its companion Q column; |R_jj| < rel_tol * max_diag, recomputed each
    pass).  This is the SPQR design point — switch to BLAS3 once fronts
    densify (cholmod_wrapper.h:44-100) — without changing rank decisions
    between routes."""
    A = np.zeros((m, n))
    A[pos // n, pos % n] = np.asarray(vals, np.float64)
    Qd, Rd = np.linalg.qr(A)                # Q: m x k, R: k x n, k=min(m,n)
    k = Rd.shape[0]
    # slots[j] = (row vector over columns j.., companion Q column) or None
    rows_: list = [None] * n
    qcols: list = [None] * n
    for j in range(min(k, n)):
        if np.any(Rd[j]):
            rows_[j] = Rd[j].copy()
            qcols[j] = Qd[:, j].copy()
    if rel_tol > 0.0:
        while True:
            diags = [abs(rows_[j][j]) for j in range(n) if rows_[j] is not None]
            if not diags:
                break
            cut = rel_tol * max(diags)
            dead = next((j for j in range(n)
                         if rows_[j] is not None and abs(rows_[j][j]) < cut),
                        -1)
            if dead < 0:
                break
            row = rows_[dead]
            v = qcols[dead]
            rows_[dead] = qcols[dead] = None
            row[dead] = 0.0                 # drop the tiny pivot entry
            nz = np.flatnonzero(row)
            while nz.size:
                j = int(nz[0])
                if rows_[j] is None:
                    rows_[j] = row
                    qcols[j] = v
                    break
                r0, a0 = rows_[j][j], row[j]
                den = np.hypot(r0, a0)
                c, s = r0 / den, a0 / den
                rows_[j], row = (c * rows_[j] + s * row,
                                 c * row - s * rows_[j])
                qcols[j], v = c * qcols[j] + s * v, c * v - s * qcols[j]
                row[j] = 0.0
                nz = np.flatnonzero(row)
    kept = [j for j in range(n) if rows_[j] is not None]
    rank = len(kept)
    if rank == 0:
        return {}, {}, 0
    q_flat: Dict[int, float] = {}
    c_flat: Dict[int, float] = {}
    for kk, j in enumerate(kept):
        qc = qcols[j]
        for i in np.flatnonzero(qc):
            q_flat[int(i) * rank + kk] = float(qc[i])
        rw = rows_[j]
        for c_ in np.flatnonzero(rw):
            c_flat[kk * n + int(c_)] = float(rw[c_])
    return q_flat, c_flat, rank


def sparse_qc(pos: np.ndarray, vals: np.ndarray, m: int, n: int,
              rel_tol: float, ordering: Optional[int] = None
              ) -> Optional[Tuple[Dict[int, float], Dict[int, float], int]]:
    """Factor the m x n matrix with flat-position COO data ``pos/vals`` as
    A = Q C (Q: m x r orthonormal columns, C: r x n), rank-revealed with
    ``rel_tol`` (|R_jj| >= rel_tol * max diag kept; 0 = structural only).
    Returns (q_flat_dict, c_flat_dict, rank), or None when no route is
    available or the matrix is numerically empty.

    Dispatch: narrow-profile patterns (banded/structured — the regime TT
    sparse cores live in) run the native row-Givens kernel with a
    fill-reducing column preorder; rows wider than
    ``ROW_SPAN_NATIVE_LIMIT`` on average take the dense-Heath BLAS3 route
    — the same rank rule, LAPACK speed (SPQR's supernodal switch,
    measured boundary in doc/performance.md)."""
    pos = np.ascontiguousarray(pos, dtype=np.int64)
    if (min(m, n) >= 64 and pos.size
            and os.environ.get("XERUS_TPU_SPARSEQR_FORCE_NATIVE") != "1"
            and mean_row_span(pos, m, n) > ROW_SPAN_NATIVE_LIMIT):
        q, c, rank = dense_heath_qc(pos, vals, m, n, rel_tol)
        return (q, c, rank) if rank else None
    out = _factor_raw(pos, vals, m, n, rel_tol, ordering)
    if out is None:
        return None
    qr_, qc_, qv, rr, rc, rv, rank, _piv = out
    q = dict(zip((qr_ * rank + qc_).tolist(), qv.tolist()))
    c = dict(zip((rr * n + rc).tolist(), rv.tolist()))
    return q, c, rank


def sparse_solve_ls(pos: np.ndarray, vals: np.ndarray, m: int, n: int,
                    b: np.ndarray, rel_tol: float,
                    ordering: Optional[int] = None) -> Optional[np.ndarray]:
    """Least-squares/basic solve of the sparse m x n system A x ~= b via the
    native QR — the reference's SuiteSparseQR(ordering, EPSILON, A, b) solve
    (cholmod_wrapper.cpp:173-225): factor A = Q C, then back-substitute
    C x = Q^T b over the kept columns (dead columns get x = 0, SPQR's basic
    solution).  Returns None when the native library is unavailable — or
    when the row-span predictor says the pattern densifies (the caller's
    dense LAPACK solve is the right performance class there, exactly the
    reference's own dense dispatch tensor.cpp:1516-1523)."""
    pos = np.ascontiguousarray(pos, dtype=np.int64)
    if (min(m, n) >= 64 and pos.size
            and os.environ.get("XERUS_TPU_SPARSEQR_FORCE_NATIVE") != "1"
            and mean_row_span(pos, m, n) > ROW_SPAN_NATIVE_LIMIT):
        return None
    out = _factor_raw(pos, vals, m, n, rel_tol, ordering)
    if out is None:
        return None
    qr_, qc_, qv, rr, rc, rv, rank, piv = out
    b = np.asarray(b, dtype=np.float64).reshape(m)
    y = np.zeros(rank, np.float64)
    np.add.at(y, qc_, qv * b[qr_])                 # y = Q^T b
    crows: list = [[] for _ in range(rank)]
    for k, c, v in zip(rr.tolist(), rc.tolist(), rv.tolist()):
        crows[k].append((c, v))
    x = np.zeros(n, np.float64)
    # R is triangular in ELIMINATION order: row k's pivot column is
    # piv[k], and its tail only touches pivots of rows > k, so descending
    # back-substitution over k is exact.
    for k in range(rank - 1, -1, -1):
        pivot = int(piv[k])
        acc = y[k]
        lead_val = 0.0
        for col, v in crows[k]:
            if col == pivot:
                lead_val = v
            else:
                acc -= v * x[col]
        x[pivot] = acc / lead_val
    return x


def sparse_cq(pos: np.ndarray, vals: np.ndarray, m: int, n: int,
              rel_tol: float, ordering: Optional[int] = None
              ) -> Optional[Tuple[Dict[int, float], Dict[int, float], int]]:
    """A = C Q (C: m x r, Q: r x n orthonormal rows) via QC of the
    transpose (the reference's trick, cholmod_wrapper.cpp:255-266)."""
    rows = pos // n
    cols = pos % n
    t_pos = cols * m + rows            # transpose: (n x m) flat positions
    out = sparse_qc(t_pos, vals, n, m, rel_tol, ordering)
    if out is None:
        return None
    qt, ct, rank = out                 # A^T = Q' C'  ->  A = C'^T Q'^T
    # C = C'^T: (m x rank) from ct (rank x m); Q = Q'^T: (rank x n) from qt
    c = {(p % m) * rank + (p // m): v for p, v in ct.items()}
    q = {(p % rank) * n + (p // rank): v for p, v in qt.items()}
    return c, q, rank
