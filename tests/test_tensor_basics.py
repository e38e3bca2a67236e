"""Tensor construction / access / modifier tests.

Ports the intent of the reference suites fullTensor_utilities.cxx,
fullTensor_factor.cxx, fullTensor_add_sub.cxx, tensor.cxx (randomized inputs,
algebraic-identity oracles)."""

import numpy as np
import pytest

import xerus_tpu as xe
from xerus_tpu import Tensor, Representation


def test_creation_zero_init():
    t = Tensor([2, 3, 4], Representation.Dense)
    assert t.degree() == 3
    assert t.size == 24
    assert t.frob_norm() == 0.0
    assert not t.has_factor()


def test_ones_identity_kronecker_dirac():
    o = Tensor.ones([2, 3])
    assert np.allclose(o.to_ndarray(), np.ones((2, 3)))

    ident = Tensor.identity([3, 2, 3, 2])
    arr = ident.to_ndarray().reshape(6, 6)
    assert np.allclose(arr, np.eye(6))

    k = Tensor.kronecker([3, 3, 3])
    arr = k.to_ndarray()
    for i in range(3):
        for j in range(3):
            for l in range(3):
                assert arr[i, j, l] == (1.0 if i == j == l else 0.0)

    d = Tensor.dirac([4, 4], [1, 2])
    arr = d.to_ndarray()
    assert arr[1, 2] == 1.0 and arr.sum() == 1.0

    d2 = Tensor.dirac([4, 4], 5)
    assert d2.to_ndarray().reshape(-1)[5] == 1.0


def test_element_access_dense_sparse():
    t = Tensor([3, 3])  # sparse default
    assert t.is_sparse()
    t[[0, 1]] = 5.0
    assert t[[0, 1]] == 5.0
    assert t[1] == 5.0  # linear position 0*3+1
    t.use_dense_representation()
    assert t.is_dense()
    assert t[[0, 1]] == 5.0
    t[[2, 2]] = -1.0
    assert t[8] == -1.0


def test_factor_semantics():
    t = Tensor.random([4, 4])
    base = t.to_ndarray()
    t *= 3.0
    assert t.has_factor()
    assert np.allclose(t.to_ndarray(), 3 * base)
    # element read respects factor
    assert np.isclose(t[[1, 1]], 3 * base[1, 1])
    # element write applies factor first
    t[[0, 0]] = 7.0
    assert not t.has_factor()
    assert np.isclose(t[[0, 0]], 7.0)
    assert np.isclose(t[[1, 1]], 3 * base[1, 1])


def test_add_sub_scaling():
    a = Tensor.random([3, 4])
    b = Tensor.random([3, 4])
    an, bn = a.to_ndarray(), b.to_ndarray()
    c = a + b
    assert np.allclose(c.to_ndarray(), an + bn)
    d = a - b
    assert np.allclose(d.to_ndarray(), an - bn)
    e = 2.0 * a
    e += b
    assert np.allclose(e.to_ndarray(), 2 * an + bn)
    f = a / 4.0
    assert np.allclose(f.to_ndarray(), an / 4)
    g = -a
    assert np.allclose(g.to_ndarray(), -an)


def test_sparse_add_stays_sparse():
    a = Tensor.random([10, 10], n=5)
    b = Tensor.random([10, 10], n=5)
    c = a + b
    assert c.is_sparse()
    assert np.allclose(c.to_ndarray(), a.to_ndarray() + b.to_ndarray())
    c -= b
    assert np.allclose(c.to_ndarray(), a.to_ndarray(), atol=1e-14)


def test_norms():
    t = Tensor.random([5, 5])
    arr = t.to_ndarray()
    assert np.isclose(t.frob_norm(), np.linalg.norm(arr))
    assert np.isclose(t.one_norm(), np.abs(arr).sum())
    t *= -2.0
    assert np.isclose(t.frob_norm(), 2 * np.linalg.norm(arr))


def test_fix_mode():
    t = Tensor.random([3, 4, 5])
    arr = t.to_ndarray()
    u = t.copy()
    u.fix_mode(1, 2)
    assert u.dimensions == [3, 5]
    assert np.allclose(u.to_ndarray(), arr[:, 2, :])


def test_fix_mode_sparse():
    t = Tensor.random([4, 4], n=8)
    arr = t.to_ndarray()
    t.fix_mode(0, 1)
    assert t.is_sparse()
    assert np.allclose(t.to_ndarray(), arr[1])


def test_resize_mode_grow_shrink():
    t = Tensor.random([3, 4])
    arr = t.to_ndarray()
    t.resize_mode(1, 6)  # append two zero cols
    assert t.dimensions == [3, 6]
    assert np.allclose(t.to_ndarray()[:, :4], arr)
    assert np.allclose(t.to_ndarray()[:, 4:], 0)
    t.resize_mode(1, 4)  # remove last two again
    assert np.allclose(t.to_ndarray(), arr)
    t.resize_mode(0, 2, 1)  # remove row before pos 1 (row 0)
    assert np.allclose(t.to_ndarray(), arr[1:, :])


def test_resize_mode_sparse():
    t = Tensor.random([3, 3], n=9)
    arr = t.to_ndarray()
    t.resize_mode(0, 5, 1)
    assert t.is_sparse()
    expect = np.insert(arr, [1, 1], 0, axis=0)
    assert np.allclose(t.to_ndarray(), expect)


def test_remove_slate():
    t = Tensor.random([3, 4])
    arr = t.to_ndarray()
    t.remove_slate(1, 1)
    assert t.dimensions == [3, 3]
    assert np.allclose(t.to_ndarray(), np.delete(arr, 1, axis=1))


def test_perform_trace():
    t = Tensor.random([4, 3, 4])
    arr = t.to_ndarray()
    t.perform_trace(0, 2)
    assert t.dimensions == [3]
    assert np.allclose(t.to_ndarray(), np.einsum('iji->j', arr))


def test_reinterpret_dimensions():
    t = Tensor.random([4, 4])
    arr = t.to_ndarray()
    t.reinterpret_dimensions([2, 2, 2, 2])
    assert t.dimensions == [2, 2, 2, 2]
    assert np.allclose(t.to_ndarray().reshape(4, 4), arr)


def test_offset_add():
    t = Tensor([4, 4], Representation.Dense)
    small = Tensor.ones([2, 2])
    t.offset_add(small, [1, 1])
    arr = t.to_ndarray()
    assert arr[1:3, 1:3].sum() == 4.0 and arr.sum() == 4.0


def test_modify_entries_and_diagonal():
    t = Tensor.random([3, 3])
    arr = t.to_ndarray()
    t.modify_entries(lambda v: 2 * v)
    assert np.allclose(t.to_ndarray(), 2 * arr)
    t.modify_diagonal_entries(lambda v: 0.0)
    assert np.allclose(np.diag(t.to_ndarray()), 0)


def test_dense_sparse_roundtrip():
    t = Tensor.random([6, 6], n=7)
    dense = t.dense_copy()
    assert dense.is_dense()
    back = dense.sparse_copy()
    assert back.is_sparse()
    assert back.sparsity() == t.count_non_zero_entries()
    assert xe.approx_equal(back, t, 1e-14)


def test_count_non_zero_and_valid():
    t = Tensor.random([5, 5])
    assert t.all_entries_valid()
    assert t.count_non_zero_entries() == 25
    t[[0, 0]] = 0.0
    assert t.count_non_zero_entries() == 24


def test_multiindex_conversion():
    dims = [3, 4, 5]
    for pos in [0, 7, 59, 33]:
        mi = Tensor.position_to_multiIndex(pos, dims)
        assert Tensor.multiIndex_to_position(mi, dims) == pos


def test_approx_equal():
    a = Tensor.random([4, 4])
    b = a.copy()
    assert xe.approx_equal(a, b)
    b2 = a + 1e-3 * Tensor.random([4, 4])
    assert not xe.approx_equal(a, b2, 1e-9)
    assert xe.approx_entrywise_equal(a, a.to_ndarray().reshape(-1))


def test_random_orthogonal():
    q = Tensor.random_orthogonal([6], [4])
    arr = q.to_ndarray()
    assert np.allclose(arr.T @ arr, np.eye(4), atol=1e-12)


def test_reshuffle():
    t = Tensor.random([2, 3, 4])
    arr = t.to_ndarray()
    # shuffle[k] = new position of old mode k
    out = xe.reshuffle(t, [2, 0, 1])
    assert out.dimensions == [3, 4, 2]
    assert np.allclose(out.to_ndarray(), np.transpose(arr, (1, 2, 0)))


def test_reshuffle_sparse_preserves_rep():
    t = Tensor.random([4, 5], n=6)
    out = xe.reshuffle(t, [1, 0])
    assert out.is_sparse()
    assert np.allclose(out.to_ndarray(), t.to_ndarray().T)


def test_tensor_binding_ctor_overloads():
    """Reference python binding ctors (tensor.cpp bindings): Tensor(int
    degree) -> 1x...x1 zero tensor; Tensor(TTTensor) contracts a network;
    Tensor(Tensor) deep-copies."""
    t3 = Tensor(3)
    assert t3.dimensions == [1, 1, 1] and float(t3[[0, 0, 0]]) == 0.0

    tt = xe.TTTensor.random([3, 4, 3], 2)
    dense = Tensor(tt)
    assert np.allclose(dense.to_ndarray(), tt.to_tensor().to_ndarray(),
                       atol=1e-12)

    src = Tensor.random([2, 5])
    cp = Tensor(src)
    cp[[0, 0]] = 123.0
    assert src[[0, 0]] != 123.0   # deep copy, not aliased
    assert cp.dimensions == [2, 5]
