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
