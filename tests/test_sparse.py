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
