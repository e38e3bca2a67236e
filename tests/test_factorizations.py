"""Factorization tests (intent of fullTensor_factorisations.cxx,
fullTensor_solve.cxx: round-trip + orthogonality + truncation oracles)."""

import numpy as np
import pytest

import xerus_tpu as xe
from xerus_tpu import Tensor
from xerus_tpu.core import factorizations as fact


def _rand(dims):
    return Tensor.random(dims)


def test_svd_roundtrip_and_orthogonality():
    t = _rand([4, 5, 6])
    U, S, Vt = fact.calculate_svd(t, 1)
    rec = xe.contract(xe.contract(U, S, 1), Vt, 1)
    assert xe.approx_equal(rec, t, 1e-12)
    u = U.to_ndarray().reshape(4, -1)
    assert np.allclose(u.T @ u, np.eye(u.shape[1]), atol=1e-12)
    v = Vt.to_ndarray().reshape(Vt.dimensions[0], -1)
    assert np.allclose(v @ v.T, np.eye(v.shape[0]), atol=1e-12)
    s = S.to_ndarray()
    d = np.diag(s)
    assert np.all(np.diff(d) <= 1e-14)  # descending
    assert np.allclose(s, np.diag(d))


def test_svd_max_rank_truncation():
    t = _rand([8, 8])
    U, S, Vt = fact.calculate_svd(t, 1, max_rank=3)
    assert S.dimensions == [3, 3]
    full_s = np.linalg.svd(t.to_ndarray(), compute_uv=False)
    assert np.allclose(np.diag(S.to_ndarray()), full_s[:3], atol=1e-12)


def test_svd_eps_truncation():
    # rank-2 matrix + noise below eps threshold
    a = np.outer(np.arange(1, 7), np.ones(6)) + np.outer(np.ones(6), np.arange(6))
    t = Tensor.from_ndarray(a)
    U, S, Vt = fact.calculate_svd(t, 1, eps=1e-10)
    assert S.dimensions[0] == 2


def test_svd_factor_handling():
    t = _rand([5, 5])
    t *= -2.0
    U, S, Vt = fact.calculate_svd(t, 1)
    rec = xe.contract(xe.contract(U, S, 1), Vt, 1)
    assert xe.approx_equal(rec, t, 1e-12)
    assert np.all(np.diag(S.to_ndarray()) >= 0)


def test_qr_roundtrip():
    for dims, split in [([6, 4], 1), ([3, 4, 5], 2), ([4, 12], 1)]:
        t = _rand(dims)
        Q, R = fact.calculate_qr(t, split)
        rec = xe.contract(Q, R, 1)
        assert xe.approx_equal(rec, t, 1e-12)
        q = Q.to_ndarray().reshape(-1, Q.dimensions[-1])
        assert np.allclose(q.T @ q, np.eye(q.shape[1]), atol=1e-12)


def test_rq_roundtrip():
    for dims, split in [([6, 4], 1), ([3, 4, 5], 1), ([12, 4], 1)]:
        t = _rand(dims)
        R, Q = fact.calculate_rq(t, split)
        rec = xe.contract(R, Q, 1)
        assert xe.approx_equal(rec, t, 1e-12)
        q = Q.to_ndarray().reshape(Q.dimensions[0], -1)
        assert np.allclose(q @ q.T, np.eye(q.shape[0]), atol=1e-12)


def test_qc_rank_revealing():
    # build an exactly rank-3 6x8 matrix
    a = xe.misc.randomEngine.normal(size=(6, 3)) @ xe.misc.randomEngine.normal(size=(3, 8))
    t = Tensor.from_ndarray(a)
    Q, C = fact.calculate_qc(t, 1)
    assert Q.dimensions[-1] == 3
    rec = xe.contract(Q, C, 1)
    assert xe.approx_equal(rec, t, 1e-12)
    q = Q.to_ndarray()
    assert np.allclose(q.T @ q, np.eye(3), atol=1e-12)


def test_cq_rank_revealing():
    a = xe.misc.randomEngine.normal(size=(8, 3)) @ xe.misc.randomEngine.normal(size=(3, 6))
    t = Tensor.from_ndarray(a)
    C, Q = fact.calculate_cq(t, 1)
    assert C.dimensions[-1] == 3
    rec = xe.contract(C, Q, 1)
    assert xe.approx_equal(rec, t, 1e-12)
    q = Q.to_ndarray()
    assert np.allclose(q @ q.T, np.eye(3), atol=1e-12)


def test_qc_cq_pivoted_qr_method_parity(monkeypatch):
    """method='qrp' (genuine dgeqp3-semantics pivoted Householder QR,
    ops/pivoted_qr.py — the reference's blasLapackWrapper.cpp:262-361
    path) must make the SAME rank decisions as the default SVD rule and
    produce exact rank-revealing factorizations (VERDICT r2 item #8)."""
    monkeypatch.setattr(fact, "_QC_METHOD", "qrp")
    for lhs, rhs, true_rank in ((6, 8, 3), (9, 5, 2), (7, 7, 7)):
        a = (xe.misc.randomEngine.normal(size=(lhs, true_rank))
             @ xe.misc.randomEngine.normal(size=(true_rank, rhs)))
        t = Tensor.from_ndarray(a)
        Q, C = fact.calculate_qc(t, 1)
        assert Q.dimensions[-1] == true_rank
        assert xe.approx_equal(xe.contract(Q, C, 1), t, 1e-12)
        q = Q.to_ndarray()
        assert np.allclose(q.T @ q, np.eye(true_rank), atol=1e-12)
        C2, Q2 = fact.calculate_cq(t, 1)
        assert C2.dimensions[-1] == true_rank
        assert xe.approx_equal(xe.contract(C2, Q2, 1), t, 1e-12)
        q2 = Q2.to_ndarray()
        assert np.allclose(q2 @ q2.T, np.eye(true_rank), atol=1e-12)


def test_pivoted_qr_kernel_contract():
    """householder_qrp: exact A[:, perm] = Q R, orthonormal Q,
    non-increasing |diag(R)| (the pivoting invariant the rank rule
    relies on), rectangular both ways."""
    from xerus_tpu.ops.pivoted_qr import householder_qrp
    import jax
    import jax.numpy as jnp
    for m, n in ((12, 7), (7, 12), (16, 16)):
        a = xe.misc.randomEngine.normal(size=(m, n))
        q, r, perm = jax.jit(householder_qrp)(jnp.asarray(a))
        q, r, perm = np.asarray(q), np.asarray(r), np.asarray(perm)
        assert np.allclose(a[:, perm], q @ r, atol=1e-12)
        assert np.allclose(q.T @ q, np.eye(q.shape[1]), atol=1e-12)
        d = np.abs(np.diag(r))
        assert np.all(d[:-1] >= d[1:] - 1e-12)
        assert sorted(perm.tolist()) == list(range(n))


def test_pseudo_inverse():
    t = _rand([5, 3])
    pinv = fact.pseudo_inverse(t, 1)
    assert pinv.dimensions == [3, 5]
    assert np.allclose(pinv.to_ndarray(), np.linalg.pinv(t.to_ndarray()), atol=1e-10)


def test_solve_square():
    A = _rand([6, 6])
    b = _rand([6])
    x = fact.solve(A, b)
    assert np.allclose(A.to_ndarray() @ x.to_ndarray(), b.to_ndarray(), atol=1e-9)


def test_solve_spd_path():
    g = _rand([6, 6]).to_ndarray()
    A = Tensor.from_ndarray(g @ g.T + 6 * np.eye(6))
    b = _rand([6])
    x = fact.solve(A, b)
    assert np.allclose(A.to_ndarray() @ x.to_ndarray(), b.to_ndarray(), atol=1e-9)


def test_solve_factor_propagation():
    A = _rand([5, 5]); A *= 2.0
    b = _rand([5]); b *= -3.0
    x = fact.solve(A, b)
    assert np.allclose(A.to_ndarray() @ x.to_ndarray(), b.to_ndarray(), atol=1e-9)


def test_solve_least_squares_overdetermined():
    A = _rand([8, 3])
    b = _rand([8])
    x = fact.solve_least_squares(A, b)
    expect, *_ = np.linalg.lstsq(A.to_ndarray(), b.to_ndarray(), rcond=None)
    assert np.allclose(x.to_ndarray(), expect, atol=1e-10)


def test_solve_matrix_rhs_extra_degree():
    A = _rand([6, 6])
    B = _rand([6, 4])
    X = fact.solve(A, B, extra_degree=1)
    assert X.dimensions == [6, 4]
    assert np.allclose(A.to_ndarray() @ X.to_ndarray(), B.to_ndarray(), atol=1e-9)


def test_singular_solve_falls_back():
    a = np.zeros((4, 4)); a[0, 0] = 1.0
    A = Tensor.from_ndarray(a)
    b = Tensor.from_ndarray(np.array([2.0, 0, 0, 0]))
    x = fact.solve(A, b)
    assert np.allclose(a @ x.to_ndarray(), b.to_ndarray(), atol=1e-9)


def test_svd_gesdd_nonconvergence_fallback(monkeypatch):
    """XLA's CPU SVD (gesdd) returns nan SILENTLY on non-convergence; the
    object layer must fall back to the robust gesvd driver instead of
    letting the QC rank rule read a nan spectrum as 'rank 1' (round-4
    field failure: a host()-scoped DMRG residual readout nan'd and
    silently truncated a 96x48 unfolding to rank 1).  Simulate the gesdd
    failure; the real failing matrices reproduce it end-to-end in
    test_gesdd_failure_fixtures."""
    import jax.numpy as jnp

    def fake_gesdd(a):
        u, s, vt = np.linalg.svd(np.asarray(a), full_matrices=False)
        return (jnp.asarray(u), jnp.full(s.shape, np.nan, s.dtype),
                jnp.asarray(vt))

    monkeypatch.setattr(fact, "_svd_jit", fake_gesdd)
    A = _rand([12, 7])
    u, s, vt = fact._svd_robust(A.to_jax())
    assert not np.isnan(np.asarray(s)).any()
    rec = np.asarray(u) @ np.diag(np.asarray(s)) @ np.asarray(vt)
    assert np.allclose(rec, A.to_ndarray(), atol=1e-12)
    # the QC route heals too (rank is revealed from the FALLBACK spectrum)
    C, Q = fact.calculate_cq(A, 1)
    assert C.dimensions[-1] == 7
    rec2 = np.tensordot(C.to_ndarray(), Q.to_ndarray(), axes=([1], [0]))
    assert np.allclose(rec2, A.to_ndarray(), atol=1e-12)


def test_revealed_rank_rejects_nan_spectrum():
    with pytest.raises(Exception, match="nan singular values"):
        fact._revealed_rank(np.array([np.nan, 1.0, 0.5]))


def test_gesdd_failure_fixtures():
    """End-to-end regression on REAL matrices that made XLA's CPU gesdd
    return nan silently (captured from TPU-session DMRG residual readouts
    via XERUS_TPU_CAPTURE_GESDD_DIR; tests/data/gesdd_failure_*.npy).
    Each fixture must (a) actually reproduce the gesdd nan, (b) come out
    finite and exactly reconstructed through the object-layer CQ — the
    silent rank-1 collapse was the round-4 field failure."""
    import glob
    import os
    paths = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "data",
                                          "gesdd_failure_*.npy")))
    if not paths:
        pytest.skip("no captured fixtures in this checkout")
    for path in paths:
        m = np.load(path)
        # (a) the fixture still triggers the raw gesdd failure — if a
        # LAPACK upgrade fixes it this assert tells us the fixture went
        # stale rather than silently testing nothing
        _, s_raw, _ = fact._svd_jit(m)
        assert np.isnan(np.asarray(s_raw)).any(), \
            f"{os.path.basename(path)} no longer reproduces the gesdd bug"
        # (b) the object layer heals it
        T = Tensor.from_ndarray(m)
        C, Q = fact.calculate_cq(T, 1)
        assert np.isfinite(C.to_ndarray()).all()
        assert np.isfinite(Q.to_ndarray()).all()
        rec = np.tensordot(C.to_ndarray(), Q.to_ndarray(), axes=([1], [0]))
        assert np.allclose(rec, m, atol=1e-10 * max(1.0, np.abs(m).max()))
        assert C.dimensions[-1] > 1   # the silent rank-1 collapse is the bug
