"""Factorization-expression DSL tests: (Q(i,r), R(r,j)) << QR(A(i,j)) etc.
— the fullTensor_factorisations.cxx surface through the indexed-expression
forms (indexedTensor_tensor_factorisations.h:40-100; expressions.py
Factorisation family + evaluate.assign_factorisation)."""

import numpy as np
import pytest

import xerus_tpu as xe
from xerus_tpu import Tensor


def _rel(a, b):
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-300)


def test_qr_dsl_roundtrip_and_orthogonality():
    A = Tensor.random([7, 5])
    i, j, r = xe.indices(3)
    Q, R = Tensor(), Tensor()
    (Q(i, r), R(r, j)) << xe.QR(A(i, j))
    q = Q.to_ndarray()
    assert _rel(q.T @ q, np.eye(q.shape[1])) < 1e-12        # Q^T Q = I
    rec = Tensor()
    rec(i, j) << Q(i, r) * R(r, j)
    assert _rel(rec.to_ndarray(), A.to_ndarray()) < 1e-12
    # R upper triangular
    assert np.allclose(np.tril(R.to_ndarray(), -1), 0.0, atol=1e-12)


def test_qr_dsl_multimode():
    """Spans: split an order-4 tensor 2+2 through the DSL."""
    A = Tensor.random([3, 4, 2, 5])
    i, j, k, l, r = xe.indices(5)
    Q, R = Tensor(), Tensor()
    (Q(i, j, r), R(r, k, l)) << xe.QR(A(i, j, k, l))
    rec = Tensor()
    rec(i, j, k, l) << Q(i, j, r) * R(r, k, l)
    assert _rel(rec.to_ndarray(), A.to_ndarray()) < 1e-12
    qm = Q.to_ndarray().reshape(12, -1)
    assert _rel(qm.T @ qm, np.eye(qm.shape[1])) < 1e-12


def test_svd_dsl_roundtrip():
    A = Tensor.random([6, 8])
    i, j, r1, r2 = xe.indices(4)
    U, S, Vt = Tensor(), Tensor(), Tensor()
    (U(i, r1), S(r1, r2), Vt(r2, j)) << xe.SVD(A(i, j))
    rec = Tensor()
    rec(i, j) << U(i, r1) * S(r1, r2) * Vt(r2, j)
    assert _rel(rec.to_ndarray(), A.to_ndarray()) < 1e-12
    u = U.to_ndarray()
    vt = Vt.to_ndarray()
    assert _rel(u.T @ u, np.eye(u.shape[1])) < 1e-12
    assert _rel(vt @ vt.T, np.eye(vt.shape[0])) < 1e-12
    s = S.to_ndarray()
    assert np.allclose(s, np.diag(np.diag(s)), atol=1e-12)  # diagonal
    d = np.diag(s)
    assert np.all(d[:-1] >= d[1:] - 1e-12)                  # sorted


def test_svd_dsl_truncated_by_rank():
    """SVD(A, maxRank): truncation through the expression form
    (fullTensor_factorisations.cxx truncated-SVD tests)."""
    rng = np.random.default_rng(7)
    B = rng.normal(size=(9, 3)) @ rng.normal(size=(3, 8))   # exact rank 3
    A = Tensor.from_ndarray(B)
    i, j, r1, r2 = xe.indices(4)
    U, S, Vt = Tensor(), Tensor(), Tensor()
    (U(i, r1), S(r1, r2), Vt(r2, j)) << xe.SVD(A(i, j), max_rank=2)
    assert S.dimensions == [2, 2]
    rec = Tensor()
    rec(i, j) << U(i, r1) * S(r1, r2) * Vt(r2, j)
    # best rank-2 approximation error equals the dropped singular value
    sv = np.linalg.svd(B, compute_uv=False)
    err = np.linalg.norm(rec.to_ndarray() - B)
    assert abs(err - sv[2]) < 1e-10
    # exact at the true rank
    (U(i, r1), S(r1, r2), Vt(r2, j)) << xe.SVD(A(i, j), max_rank=3)
    rec(i, j) << U(i, r1) * S(r1, r2) * Vt(r2, j)
    assert _rel(rec.to_ndarray(), B) < 1e-12


def test_svd_dsl_eps_truncation():
    rng = np.random.default_rng(3)
    u, _ = np.linalg.qr(rng.normal(size=(8, 8)))
    v, _ = np.linalg.qr(rng.normal(size=(8, 8)))
    B = (u[:, :4] * np.array([1.0, 0.5, 1e-9, 1e-10])) @ v[:, :4].T
    A = Tensor.from_ndarray(B)
    i, j, r1, r2 = xe.indices(4)
    U, S, Vt = Tensor(), Tensor(), Tensor()
    (U(i, r1), S(r1, r2), Vt(r2, j)) << xe.SVD(A(i, j), eps=1e-6)
    assert S.dimensions == [2, 2]                # 1e-9/1e-10 dropped


def test_svd_dsl_soft_threshold():
    """Soft-thresholded SVD through the DSL (SVD(A, softThreshold=tau):
    singular values shrink by tau, zeros dropped)."""
    rng = np.random.default_rng(11)
    u, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    v, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    sv = np.array([3.0, 2.0, 0.05])
    B = (u[:, :3] * sv) @ v[:, :3].T
    A = Tensor.from_ndarray(B)
    i, j, r1, r2 = xe.indices(4)
    U, S, Vt = Tensor(), Tensor(), Tensor()
    (U(i, r1), S(r1, r2), Vt(r2, j)) << xe.SVD(A(i, j), soft_threshold=0.1)
    d = np.diag(S.to_ndarray())
    assert np.allclose(np.sort(d)[::-1], [2.9, 1.9], atol=1e-10)


def test_rq_dsl_roundtrip():
    A = Tensor.random([5, 7])
    i, j, r = xe.indices(3)
    R, Q = Tensor(), Tensor()
    (R(i, r), Q(r, j)) << xe.RQ(A(i, j))
    q = Q.to_ndarray()
    assert _rel(q @ q.T, np.eye(q.shape[0])) < 1e-12        # rows orthonormal
    rec = Tensor()
    rec(i, j) << R(i, r) * Q(r, j)
    assert _rel(rec.to_ndarray(), A.to_ndarray()) < 1e-12


def test_qc_dsl_rank_revealing():
    """QC: rank-revealing split — C has the numerical rank, Q orthonormal
    (blasLapackWrapper.cpp:262-361 semantics)."""
    rng = np.random.default_rng(5)
    B = rng.normal(size=(8, 3)) @ rng.normal(size=(3, 6))   # rank 3
    A = Tensor.from_ndarray(B)
    i, j, r = xe.indices(3)
    Q, C = Tensor(), Tensor()
    (Q(i, r), C(r, j)) << xe.QC(A(i, j))
    assert Q.dimensions[1] == 3                 # revealed rank
    q = Q.to_ndarray()
    assert _rel(q.T @ q, np.eye(3)) < 1e-12
    rec = Tensor()
    rec(i, j) << Q(i, r) * C(r, j)
    assert _rel(rec.to_ndarray(), B) < 1e-10


def test_cq_dsl_rank_revealing():
    rng = np.random.default_rng(6)
    B = rng.normal(size=(6, 3)) @ rng.normal(size=(3, 9))   # rank 3
    A = Tensor.from_ndarray(B)
    i, j, r = xe.indices(3)
    C, Q = Tensor(), Tensor()
    (C(i, r), Q(r, j)) << xe.CQ(A(i, j))
    assert C.dimensions[1] == 3
    q = Q.to_ndarray()
    assert _rel(q @ q.T, np.eye(3)) < 1e-12
    rec = Tensor()
    rec(i, j) << C(i, r) * Q(r, j)
    assert _rel(rec.to_ndarray(), B) < 1e-10


def test_factorisation_dsl_index_reorder():
    """Targets whose indices arrive permuted: the assignment must reshuffle
    (evaluate() semantics on each output)."""
    A = Tensor.random([4, 6])
    i, j, r = xe.indices(3)
    Q, R = Tensor(), Tensor()
    # R's indices given as (j, r) — transposed output
    (Q(i, r), R(j, r)) << xe.QR(A(i, j))
    rec = Tensor()
    rec(i, j) << Q(i, r) * R(j, r)
    assert _rel(rec.to_ndarray(), A.to_ndarray()) < 1e-12


def test_factorisation_dsl_errors():
    A = Tensor.random([4, 4])
    i, j, r = xe.indices(3)
    Q, R = Tensor(), Tensor()
    with pytest.raises(Exception):
        (Q(i, r),) << xe.QR(A(i, j))            # wrong target count
    with pytest.raises(Exception):
        (Q(i, r), R(r, j)) << xe.SVD(A(i, j))   # SVD needs 3 targets


def test_svd_reference_binding_kwarg_aliases():
    """SVD(maxRank=, softThreshold=) — the reference python binding's
    spellings (factorizations.cpp) accepted as aliases."""
    A = xe.Tensor.random([6, 6])
    i, j, r1, r2 = xe.indices(4)
    U, S, Vt = xe.Tensor(), xe.Tensor(), xe.Tensor()
    (U(i, r1), S(r1, r2), Vt(r2, j)) << xe.SVD(A(i, j), maxRank=2)
    assert S.dimensions == [2, 2]
    U2, S2, Vt2 = xe.Tensor(), xe.Tensor(), xe.Tensor()
    (U2(i, r1), S2(r1, r2), Vt2(r2, j)) << xe.SVD(A(i, j), softThreshold=0.1)
    import numpy as np
    s_ref = np.linalg.svd(A.to_ndarray(), compute_uv=False)
    s_got = np.diag(S2.to_ndarray())
    assert np.allclose(s_got, np.maximum(s_ref[:len(s_got)] - 0.1, 0.0)[
        :len(s_got)], atol=1e-10)
