"""Sparse tensor tests (intent of sparseTensor_*.cxx and
fullTensor_sparseTensor_interaction.cxx: dense/sparse consistency oracles)."""

import numpy as np
import pytest

import xerus_tpu as xe
from xerus_tpu import Tensor


def test_sparse_creation_and_access():
    t = Tensor.random([8, 8], n=6)
    assert t.is_sparse() and t.sparsity() == 6
    dense = t.to_ndarray()
    assert np.count_nonzero(dense) == 6


def test_sparse_dense_product_consistency():
    s = Tensor.random([6, 7], n=8)
    d = Tensor.random([7, 5])
    i, j, k = xe.indices(3)
    out = Tensor()
    out(i, k) << s(i, j) * d(j, k)
    assert np.allclose(out.to_ndarray(), s.to_ndarray() @ d.to_ndarray(), atol=1e-12)


def test_sparse_sparse_product_stays_sparse():
    a = Tensor.random([20, 20], n=10)
    b = Tensor.random([20, 20], n=10)
    i, j, k = xe.indices(3)
    out = Tensor()
    out(i, k) << a(i, j) * b(j, k)
    assert out.is_sparse()
    assert np.allclose(out.to_ndarray(), a.to_ndarray() @ b.to_ndarray(), atol=1e-12)


def test_sparse_scaling_keeps_sparse():
    a = Tensor.random([10, 10], n=4)
    b = 3.0 * a
    assert b.is_sparse()
    assert np.allclose(b.to_ndarray(), 3 * a.to_ndarray())


def test_entrywise_product_sparse():
    a = Tensor.random([10, 10], n=15)
    d = Tensor.random([10, 10])
    out = xe.entrywise_product(a, d)
    assert out.is_sparse()
    assert np.allclose(out.to_ndarray(), a.to_ndarray() * d.to_ndarray())
    out2 = xe.entrywise_product(d, d)
    assert out2.is_dense()
    assert np.allclose(out2.to_ndarray(), d.to_ndarray() ** 2)


def test_sparse_dense_mixed_sum():
    a = Tensor.random([5, 5], n=5)
    d = Tensor.random([5, 5])
    out = a + d
    assert np.allclose(out.to_ndarray(), a.to_ndarray() + d.to_ndarray())


def test_use_dense_if_desirable():
    t = Tensor.random([4, 4], n=15)
    t.use_dense_representation_if_desirable()
    assert t.is_dense()
    t2 = Tensor.random([100, 100], n=3)
    t2.use_dense_representation_if_desirable()
    assert t2.is_sparse()


def test_sparse_svd():
    t = Tensor.random([12, 12], n=10)
    from xerus_tpu.core import factorizations as fact
    U, S, Vt = fact.calculate_svd(t, 1)
    rec = xe.contract(xe.contract(U, S, 1), Vt, 1)
    assert xe.approx_equal(rec, t, 1e-12)


def _sparse_tt(dims, rank, nnz=4, seed_shift=0):
    import numpy as np
    from xerus_tpu import Tensor, TTTensor
    from xerus_tpu.core.tensor import Representation
    t = TTTensor.random(dims, rank)
    comps = []
    for c in t.components:
        s = Tensor(list(c.dimensions), Representation.Sparse)
        flat = c.to_ndarray().reshape(-1)
        for i in np.argsort(-np.abs(flat))[:nnz]:
            s._sparse[int(i)] = float(flat[i])
        comps.append(s)
    tt = TTTensor._make(comps)
    tt.canonicalized = False
    return tt


def test_tt_entrywise_product_preserves_sparse_components():
    """Sparse x sparse component pairs stay sparse through the Hadamard
    rank-kron (reference sparse branch, ttNetwork.cpp:1275-1303)."""
    import numpy as np
    a = _sparse_tt([3] * 5, 3)
    b = _sparse_tt([3] * 5, 2)
    h = a.entrywise_product(b)
    assert all(c.is_sparse() for c in h.components)
    want = a.to_tensor().to_ndarray() * b.to_tensor().to_ndarray()
    got = h.to_tensor().to_ndarray()
    assert np.allclose(got, want, atol=1e-12)
    # mixed dense/sparse still correct (densifies that site only)
    a.components[2].use_dense_representation()
    h2 = a.entrywise_product(b)
    assert not h2.components[2].is_sparse()
    assert np.allclose(h2.to_tensor().to_ndarray(), want, atol=1e-12)


def test_tt_sum_preserves_sparse_components():
    """Block-diagonal += keeps sparse components sparse (ttNetwork.cpp
    :797-846 sparse branch) when both summands' cores are sparse."""
    import numpy as np
    a = _sparse_tt([3] * 5, 3)
    b = _sparse_tt([3] * 5, 2)
    s = a + b
    assert all(c.is_sparse() for c in s.components)
    want = a.to_tensor().to_ndarray() + b.to_tensor().to_ndarray()
    assert np.allclose(s.to_tensor().to_ndarray(), want, atol=1e-12)


def test_sparse_zero_contractions():
    """Contractions with an all-zero sparse tensor give exact zeros in
    every dense/sparse pairing (sparseTensor.cxx Contraction_with_0)."""
    i, j, k = xe.indices(3)
    A = Tensor.random([10, 10])
    B = Tensor([10, 10], xe.Representation.Sparse)
    B[[1, 1]] = 15
    Z = Tensor([10, 10], xe.Representation.Sparse)
    tmp = Tensor()
    for expr in (lambda: A(i, k) * Z(k, j), lambda: B(i, k) * Z(k, j),
                 lambda: Z(i, k) * Z(k, j), lambda: Z(i, k) * A(k, j),
                 lambda: Z(i, k) * B(k, j)):
        tmp(i, j) << expr()
        assert tmp.frob_norm() == 0.0
