"""Native sparse QR (native/sparseqr.cpp) — SPQR-parity tests.

Oracles mirror the reference's sparse factorization expectations
(tensor.cpp:1495-1570, cholmod_wrapper.cpp:178-266): exact reconstruction,
orthonormal Q, Heath-style rank revelation, sparse-in/sparse-out with the
desirability densify switch, and the SuiteSparseQR-style least-squares
solve used for sparse Ax=b."""

import numpy as np
import pytest

import xerus_tpu as xe
from xerus_tpu import Tensor
from xerus_tpu.core.factorizations import (calculate_qr, calculate_qc,
                                           calculate_cq, solve,
                                           solve_least_squares)
from xerus_tpu.core import sparse_qr

pytestmark = pytest.mark.skipif(not sparse_qr.native_available(),
                                reason="native sparseqr lib unavailable")


def _mat(t, split):
    m = int(np.prod(t.dimensions[:split]))
    return t.to_ndarray().reshape(m, -1)


def test_sparse_qr_reconstructs_and_orthonormal():
    t = Tensor.random([30, 12], n=50)
    t.factor = -1.5
    A = _mat(t, 1)
    Q, R = calculate_qr(t, 1)
    Qm, Rm = _mat(Q, 1), _mat(R, 1)
    assert np.linalg.norm(Qm @ Rm - A) < 1e-12 * np.linalg.norm(A)
    assert np.linalg.norm(Qm.T @ Qm - np.eye(Qm.shape[1])) < 1e-13


def test_sparse_qc_rank_revealing():
    # two independent columns replicated -> numerical rank 2
    s = Tensor([16, 6], xe.Representation.Sparse)
    for i in range(16):
        s._sparse[i * 6 + 0] = float(i + 1)
        s._sparse[i * 6 + 3] = 2.0 * (i + 1)
        s._sparse[i * 6 + 1] = float((i * 7) % 5 - 2)
        s._sparse[i * 6 + 4] = -0.5 * ((i * 7) % 5 - 2)
    A = _mat(s, 1)
    Q, C = calculate_qc(s, 1)
    rank = Q.dimensions[-1]
    assert rank == np.linalg.matrix_rank(A) == 2
    assert np.linalg.norm(_mat(Q, 1) @ _mat(C, 1) - A) < 1e-12 * np.linalg.norm(A)


def test_sparse_cq_orthonormal_rows():
    t = Tensor.random([9, 25], n=40)
    A = _mat(t, 1)
    C, Qt = calculate_cq(t, 1)
    Cm = _mat(C, 1)
    Qm = Qt.to_ndarray().reshape(Qt.dimensions[0], -1)
    assert np.linalg.norm(Cm @ Qm - A) < 1e-12 * max(np.linalg.norm(A), 1e-30)
    assert np.linalg.norm(Qm @ Qm.T - np.eye(Qm.shape[0])) < 1e-13


def test_sparse_outputs_stay_sparse_when_desirable():
    # very sparse tall matrix: one entry per row, disjoint columns ->
    # outputs are structurally sparse and must remain so
    s = Tensor([64, 64], xe.Representation.Sparse)
    for i in range(0, 64, 2):
        s._sparse[i * 64 + (i % 64)] = float(i + 1)
    Q, C = calculate_qc(s, 1)
    assert Q.is_sparse() and C.is_sparse()
    A = _mat(s, 1)
    assert np.linalg.norm(_mat(Q, 1) @ _mat(C, 1) - A) < 1e-12 * np.linalg.norm(A)


def test_sparse_solve_square_and_least_squares():
    rng = np.random.default_rng(3)
    # well-conditioned sparse square system: diagonal + few off-diagonals
    n = 24
    s = Tensor([n, n], xe.Representation.Sparse)
    for i in range(n):
        s._sparse[i * n + i] = 4.0 + rng.uniform()
    for _ in range(20):
        i, j = rng.integers(0, n, 2)
        s._sparse[int(i) * n + int(j)] = s._sparse.get(int(i) * n + int(j), 0.0) + 0.3
    b = Tensor.from_ndarray(rng.normal(size=n))
    x = solve(s, b)
    assert np.linalg.norm(s.to_ndarray() @ x.to_ndarray() - b.to_ndarray()) < 1e-10

    # overdetermined least squares vs dense lstsq oracle
    t = Tensor.random([40, 7], n=60)
    bb = Tensor.from_ndarray(rng.normal(size=40))
    xs = solve_least_squares(t, bb)
    want, *_ = np.linalg.lstsq(_mat(t, 1), bb.to_ndarray(), rcond=None)
    assert np.allclose(xs.to_ndarray(), want, atol=1e-9)


def test_sparse_qr_consistency_with_dense():
    """Same tensor through sparse and densified paths: identical subspaces
    (QQ^T projectors agree) and identical ranks (consistency.cxx pattern)."""
    t = Tensor.random([18, 10], n=35)
    Qs, _ = calculate_qc(t, 1)
    td = t.copy()
    td.use_dense_representation()
    Qd, _ = calculate_qc(td, 1)
    Ps = _mat(Qs, 1) @ _mat(Qs, 1).T
    Pd = _mat(Qd, 1) @ _mat(Qd, 1).T
    assert Qs.dimensions[-1] == Qd.dimensions[-1]
    assert np.linalg.norm(Ps - Pd) < 1e-10


def test_sparse_qc_tiny_pivot_tail_not_lost():
    """Heath dead-pivot handling: a row whose leading diagonal is below
    tolerance but whose tail carries O(1) mass must be re-eliminated, not
    dropped (review finding: the naive rule lost unit mass)."""
    s = Tensor([2, 2], xe.Representation.Sparse)
    s._sparse[0] = 1e-20
    s._sparse[1] = 1.0
    s._sparse[3] = 1.0
    A = _mat(s, 1)
    Q, C = calculate_qc(s, 1)
    err = np.linalg.norm(_mat(Q, 1) @ _mat(C, 1) - A)
    assert err < 1e-12          # A is numerically rank 1; QC must keep it
    assert Q.dimensions[-1] == 1

    rng = np.random.default_rng(5)
    t = Tensor([20, 8], xe.Representation.Sparse)
    for i in range(20):
        t._sparse[i * 8 + int(rng.integers(1, 8))] = float(rng.normal())
    t._sparse[0] = 1e-18        # tiny pivot with O(1) tail in its row
    t._sparse[5] = 2.5
    B = _mat(t, 1)
    Q, C = calculate_qc(t, 1)
    assert np.linalg.norm(_mat(Q, 1) @ _mat(C, 1) - B) < 1e-12 * np.linalg.norm(B)


def test_sparse_qr_banded_large_scale():
    """Largest-practical-size check (VERDICT r3 #7): the native Givens QR
    on a bandwidth-limited pattern at n=4096 — the structured regime TT
    sparse cores live in, where the round-4 scale study measured it
    ~2400x faster than densify+LAPACK (benchmarks/sparseqr_scale.json).
    Random-scatter patterns at this size are the documented SPQR debt
    (doc/performance.md) and are NOT exercised here: their fill-in is
    dense-like and the wall is minutes."""
    rng = np.random.default_rng(0xC0FFEE)
    m, n, k = 8192, 4096, 2
    rows = np.repeat(np.arange(m), k)
    base = (rows * n) // m
    cols = np.minimum(base + rng.integers(0, 2, size=rows.size), n - 1)
    pos = np.unique(rows * n + cols)
    vals = rng.standard_normal(pos.size)
    out = sparse_qr.sparse_qc(pos, vals, m, n, 0.0)
    assert out is not None
    q_flat, c_flat, rank = out
    assert 0 < rank <= n
    # O(nnz) probe-vector reconstruction check: ||Q C x - A x|| / ||A x||
    x = rng.standard_normal(n)
    cx = np.zeros(rank)
    for p, v in c_flat.items():
        cx[p // n] += v * x[p % n]
    qcx = np.zeros(m)
    for p, v in q_flat.items():
        qcx[p // rank] += v * cx[p % rank]
    ax = np.zeros(m)
    np.add.at(ax, pos // n, vals * x[pos % n])
    assert np.linalg.norm(qcx - ax) < 1e-10 * np.linalg.norm(ax)
    # low fill: the banded pattern must stay sparse through the
    # factorization (fill(Q) ~ 2.6x nnz measured; assert a loose bound)
    assert len(q_flat) < 10 * pos.size


def test_sparse_qr_orderings_equivalent(monkeypatch):
    """Fill-reducing column preorderings (VERDICT r4 #7, SPQR's COLAMD
    stage cholmod_wrapper.h:44-100): every ordering must produce a valid
    A = Q C with orthonormal Q and the same revealed rank; the
    least-squares solve must stay exact under the permuted pivots.
    FORCE_NATIVE pins the native Givens kernel (the wide random pattern
    would otherwise take the dense-Heath route, tested separately)."""
    monkeypatch.setenv("XERUS_TPU_SPARSEQR_FORCE_NATIVE", "1")
    rng = np.random.default_rng(42)
    m, n, k = 96, 48, 4
    rows = np.repeat(np.arange(m), k)
    cols = rng.integers(0, n, size=rows.size)
    pos = np.unique(rows * n + cols)
    vals = rng.standard_normal(pos.size)
    A = np.zeros((m, n))
    A[pos // n, pos % n] = vals

    ranks = []
    for ordering in (0, 1, 2):
        out = sparse_qr.sparse_qc(pos, vals, m, n, 0.0, ordering=ordering)
        assert out is not None, ordering
        q_flat, c_flat, rank = out
        Q = np.zeros((m, rank))
        for p, v in q_flat.items():
            Q[p // rank, p % rank] = v
        C = np.zeros((rank, n))
        for p, v in c_flat.items():
            C[p // n, p % n] = v
        assert np.linalg.norm(Q.T @ Q - np.eye(rank)) < 1e-12, ordering
        assert np.linalg.norm(Q @ C - A) < 1e-12 * np.linalg.norm(A), ordering
        ranks.append(rank)
    assert len(set(ranks)) == 1, ranks

    # least-squares solve under each ordering (permuted-pivot backsub)
    b = rng.standard_normal(m)
    x_ref, *_ = np.linalg.lstsq(A, b, rcond=None)
    for ordering in (0, 1, 2):
        x = sparse_qr.sparse_solve_ls(pos, vals, m, n, b, 1e-12,
                                      ordering=ordering)
        assert x is not None, ordering
        # same normal-equations solution when A has full column rank
        assert np.linalg.norm(x - x_ref) < 1e-9 * max(1.0,
                                                      np.linalg.norm(x_ref)), \
            ordering


def test_sparse_qr_rank_deficient_under_ordering():
    """Heath dead-column detection must survive the preordering (the
    cascade re-eliminates in permuted space)."""
    rng = np.random.default_rng(3)
    m, n = 40, 12
    half = rng.standard_normal((m, 6)) * (rng.random((m, 6)) < 0.5)
    A = np.concatenate([half, 2.0 * half], axis=1)    # exact rank <= 6
    pos = np.flatnonzero(A)
    vals = A.reshape(-1)[pos]
    for ordering in (0, 1, 2):
        out = sparse_qr.sparse_qc(pos, vals, m, n, 1e-10, ordering=ordering)
        assert out is not None
        q_flat, c_flat, rank = out
        Q = np.zeros((m, rank))
        for p, v in q_flat.items():
            Q[p // rank, p % rank] = v
        C = np.zeros((rank, n))
        for p, v in c_flat.items():
            C[p // n, p % n] = v
        assert rank == 6, (ordering, rank)
        assert np.linalg.norm(Q @ C - A) < 1e-8 * np.linalg.norm(A), ordering


def test_sparse_qr_dense_route_matches_native_semantics(monkeypatch):
    """Wide-span patterns auto-route to the dense-Heath BLAS3 kernel
    (doc/performance.md measured boundary; SPQR's own supernodal switch).
    The route must (a) actually fire on random scatter, (b) produce a
    valid orthonormal factorization, and (c) make the SAME rank decisions
    as the native Heath cascade on a rank-deficient instance."""
    rng = np.random.default_rng(11)
    m, n, k = 128, 96, 6
    rows = np.repeat(np.arange(m), k)
    cols = rng.integers(0, n, size=rows.size)
    pos = np.unique(rows * n + cols)
    vals = rng.standard_normal(pos.size)
    assert sparse_qr.mean_row_span(pos.astype(np.int64), m, n) \
        > sparse_qr.ROW_SPAN_NATIVE_LIMIT

    A = np.zeros((m, n))
    A[pos // n, pos % n] = vals
    out = sparse_qr.sparse_qc(pos, vals, m, n, 0.0)        # dense route
    dq, dc, drank = out
    Q = np.zeros((m, drank))
    for p, v in dq.items():
        Q[p // drank, p % drank] = v
    C = np.zeros((drank, n))
    for p, v in dc.items():
        C[p // n, p % n] = v
    assert np.linalg.norm(Q.T @ Q - np.eye(drank)) < 1e-12
    assert np.linalg.norm(Q @ C - A) < 1e-12 * np.linalg.norm(A)

    monkeypatch.setenv("XERUS_TPU_SPARSEQR_FORCE_NATIVE", "1")
    nq, nc, nrank = sparse_qr.sparse_qc(pos, vals, m, n, 0.0)
    assert nrank == drank                       # same rank decision
    monkeypatch.delenv("XERUS_TPU_SPARSEQR_FORCE_NATIVE")

    # rank-deficient: duplicated columns; both routes must agree on rank
    half = rng.standard_normal((m, n // 2)) * (rng.random((m, n // 2)) < 0.3)
    Ad = np.concatenate([half, -0.5 * half], axis=1)
    posd = np.flatnonzero(Ad)
    valsd = Ad.reshape(-1)[posd]
    tol = 1e-10
    _, _, r_dense = sparse_qr.sparse_qc(posd, valsd, m, n, tol)
    monkeypatch.setenv("XERUS_TPU_SPARSEQR_FORCE_NATIVE", "1")
    _, _, r_native = sparse_qr.sparse_qc(posd, valsd, m, n, tol)
    assert r_dense == r_native == n // 2, (r_dense, r_native)


def test_sparse_qr_banded_stays_native():
    """Banded narrow patterns (the TT sparse-core regime) keep the native
    kernel: the span predictor must NOT fire there."""
    rng = np.random.default_rng(5)
    m, n, k = 512, 256, 2
    rows = np.repeat(np.arange(m), k)
    base = (rows * n) // m
    cols = np.minimum(base + rng.integers(0, 2, size=rows.size), n - 1)
    pos = np.unique(rows * n + cols)
    assert sparse_qr.mean_row_span(pos.astype(np.int64), m, n) \
        <= sparse_qr.ROW_SPAN_NATIVE_LIMIT
