"""Indexed-expression DSL tests (intent of fullTensor_product.cxx,
fullTensor_assignment.cxx, fullTensor_trace.cxx, indices.cxx)."""

import numpy as np
import pytest

import xerus_tpu as xe
from xerus_tpu import Tensor


def test_basic_contraction():
    A = Tensor.random([3, 4, 5])
    B = Tensor.random([4, 6, 5])
    i, j, k, l = xe.indices(4)
    C = Tensor()
    C(i, j) << A(i, k, l) * B(k, j, l)
    ref = np.einsum('ikl,kjl->ij', A.to_ndarray(), B.to_ndarray())
    assert np.allclose(C.to_ndarray(), ref, atol=1e-12)


def test_matrix_chain():
    A = Tensor.random([3, 4]); B = Tensor.random([4, 5]); C = Tensor.random([5, 6])
    i, j, k, l = xe.indices(4)
    D = Tensor()
    D(i, l) << A(i, j) * B(j, k) * C(k, l)
    ref = A.to_ndarray() @ B.to_ndarray() @ C.to_ndarray()
    assert np.allclose(D.to_ndarray(), ref, atol=1e-12)


def test_outer_product():
    a = Tensor.random([3]); b = Tensor.random([4])
    i, j = xe.indices(2)
    C = Tensor()
    C(i, j) << a(i) * b(j)
    assert np.allclose(C.to_ndarray(), np.outer(a.to_ndarray(), b.to_ndarray()))


def test_full_contraction_scalar():
    A = Tensor.random([3, 4])
    i, j = xe.indices(2)
    val = float(A(i, j) * A(i, j))
    assert np.isclose(val, (A.to_ndarray() ** 2).sum())
    assert np.isclose((A(i, j) * A(i, j)).value, (A.to_ndarray() ** 2).sum())


def test_trace_expression():
    A = Tensor.random([5, 5])
    i = xe.Index()
    assert np.isclose(float(A(i, i)), np.trace(A.to_ndarray()))


def test_partial_trace():
    A = Tensor.random([3, 4, 3])
    i, j = xe.indices(2)
    out = Tensor()
    out(j) << A(i, j, i)
    assert np.allclose(out.to_ndarray(), np.einsum('iji->j', A.to_ndarray()))


def test_fixed_indices():
    A = Tensor.random([3, 4])
    i = xe.Index()
    row = Tensor()
    row(i) << A(1, i)
    assert np.allclose(row.to_ndarray(), A.to_ndarray()[1, :])
    col = Tensor()
    col(i) << A(i, 2)
    assert np.allclose(col.to_ndarray(), A.to_ndarray()[:, 2])


def test_spans_pow_and():
    A = Tensor.random([2, 3, 4])
    B = Tensor.random([2, 3, 4])
    i, j = xe.indices(2)
    out = Tensor()
    out(i ^ 3) << A(i ^ 3) + B(i ^ 3)
    assert np.allclose(out.to_ndarray(), A.to_ndarray() + B.to_ndarray())
    val = float(A(i & 0) * B(i & 0))
    assert np.isclose(val, (A.to_ndarray() * B.to_ndarray()).sum())


def test_span_fraction():
    A = Tensor.random([3, 4, 3, 4])
    i, j = xe.indices(2)
    # symmetric matrification contraction with vectorization
    C = Tensor.random([3, 4])
    out = Tensor()
    out(i & 0) << A(i / 2, j / 2) * C(j & 0)
    ref = np.einsum('abcd,cd->ab', A.to_ndarray(), C.to_ndarray())
    assert np.allclose(out.to_ndarray(), ref, atol=1e-12)


def test_sum_with_permutation():
    A = Tensor.random([3, 3])
    i, j = xe.indices(2)
    sym = Tensor()
    sym(i, j) << A(i, j) + A(j, i)
    arr = A.to_ndarray()
    assert np.allclose(sym.to_ndarray(), arr + arr.T)


def test_scalar_scaling_in_expression():
    A = Tensor.random([4])
    i = xe.Index()
    out = Tensor()
    out(i) << 3.0 * A(i) / 2.0
    assert np.allclose(out.to_ndarray(), 1.5 * A.to_ndarray())


def test_assignment_reorders():
    A = Tensor.random([3, 4, 5])
    i, j, k = xe.indices(3)
    B = Tensor()
    B(k, i, j) << A(i, j, k)
    assert B.dimensions == [5, 3, 4]
    assert np.allclose(B.to_ndarray(), np.transpose(A.to_ndarray(), (2, 0, 1)))


def test_aliasing_self_assignment():
    A = Tensor.random([4, 4])
    arr = A.to_ndarray()
    i, j, k = xe.indices(3)
    A(i, j) << A(i, k) * A(k, j)
    assert np.allclose(A.to_ndarray(), arr @ arr, atol=1e-12)


def test_solve_via_division():
    A = Tensor.random([5, 5])
    b = Tensor.random([5])
    i, j = xe.indices(2)
    x = Tensor()
    x(i) << b(j) / A(j, i)
    assert np.allclose(A.to_ndarray().T @ x.to_ndarray() if False else
                       np.einsum('ji,i->j', A.to_ndarray(), x.to_ndarray()),
                       b.to_ndarray(), atol=1e-9)


def test_solve_multimode():
    A = Tensor.random([3, 4, 3, 4])  # (j1 j2) x (i1 i2)
    b = Tensor.random([3, 4])
    i, j = xe.indices(2)
    x = Tensor()
    x(i ^ 2) << b(j ^ 2) / A(j ^ 2, i ^ 2)
    ref = np.linalg.solve(A.to_ndarray().reshape(12, 12), b.to_ndarray().reshape(12))
    assert np.allclose(x.to_ndarray().reshape(12), ref, atol=1e-9)


def test_frob_norm_of_expression():
    A = Tensor.random([3, 4])
    B = Tensor.random([3, 4])
    i, j = xe.indices(2)
    n = (A(i, j) - B(i, j)).frob_norm()
    assert np.isclose(n, np.linalg.norm(A.to_ndarray() - B.to_ndarray()))


def test_dimension_mismatch_raises():
    A = Tensor.random([3, 4])
    B = Tensor.random([5, 4])
    i, j, k = xe.indices(3)
    C = Tensor()
    with pytest.raises(Exception):
        C(i, j) << A(i, k) * B(k, j)


def test_too_many_index_uses_raises():
    A = Tensor.random([3, 3])
    B = Tensor.random([3, 3])
    C = Tensor.random([3, 3])
    i, j = xe.indices(2)
    out = Tensor()
    with pytest.raises(Exception):
        out(j) << A(i, i) * B(i, j) * C(i, j)


def test_span_mismatch_raises():
    A = Tensor.random([3, 4, 5])
    i, j = xe.indices(2)
    out = Tensor()
    with pytest.raises(Exception):
        out(i, j) << A(i, j)  # only 2 spans for order-3 tensor


def test_sum_inside_product_materializes():
    A = Tensor.random([3, 4]); B = Tensor.random([3, 4]); C = Tensor.random([4, 5])
    i, j, k = xe.indices(3)
    out = Tensor()
    out(i, k) << (A(i, j) + B(i, j)) * C(j, k)
    ref = (A.to_ndarray() + B.to_ndarray()) @ C.to_ndarray()
    assert np.allclose(out.to_ndarray(), ref, atol=1e-12)


def test_solve_inside_product_materializes():
    M = Tensor.random([4, 4]); b = Tensor.random([4]); w = Tensor.random([4])
    i, j = xe.indices(2)
    out = Tensor()
    out() << (b(j) / M(j, i)) * w(i)
    x = np.linalg.solve(M.to_ndarray(), b.to_ndarray())
    assert np.isclose(float(out[0]), float(x @ w.to_ndarray()))


def test_matmul_tensor_contraction_and_tt_ranks():
    """Strassen-style stress test (intent of the reference's disabled
    strassen.cxx TTRanks test): the order-6 matrix-multiplication tensor
    T[i,j,j,k,i,k]=1 contracted with A and B reproduces A @ B, and its
    TT ranks equal the matricization ranks (n^2, n^2)."""
    from xerus_tpu import TTTensor
    for n in (2, 3):
        T = Tensor([n] * 6, xe.Representation.Sparse)
        for i in range(n):
            for j in range(n):
                for k in range(n):
                    T[[i, j, j, k, i, k]] = 1.0
        A = Tensor.random([n, n])
        B = Tensor.random([n, n])
        i1, i2, i3, i4, i5, i6 = xe.indices(6)
        C1 = Tensor()
        C1(i1, i3) << A(i1, i2) * B(i2, i3)
        C2 = Tensor()
        C2(i5, i6) << T(i1, i2, i3, i4, i5, i6) * A(i1, i2) * B(i3, i4)
        assert np.allclose(C1.to_ndarray(), C2.to_ndarray(), atol=1e-12)
        assert np.allclose(C1.to_ndarray(), A.to_ndarray() @ B.to_ndarray(),
                           atol=1e-12)
        ttT = TTTensor(T.copy())
        ttT.round(1e-12)
        # matricization ranks: the middle split [i2==i3][i1==i5][i4==i6]
        # collapses to delta_{i1,i5} x delta_{i4,i6} with only n active
        # rows, so the profile is (n, n^2, n, n^2, n)
        assert ttT.ranks() == [n, n * n, n, n * n, n]


def test_matmul_tensor_identity_and_tt_ranks():
    """Matrix-multiplication-tensor stress (intent of the reference's
    strassen.cxx TTRanks sketch, src/unitTests/strassen.cxx:26-53 —
    commented out upstream, kept here as a live DSL+TT oracle):
    C(i5,i6) = T(i1..i6) A(i1,i2) B(i3,i4) equals A@B, and the TT ranks
    of T are bounded by n^2."""
    import numpy as np
    from xerus_tpu import Tensor, TTTensor
    import xerus_tpu as xe

    for n in (2, 3, 4):
        T = Tensor([n] * 6)
        for i in range(n):
            for j in range(n):
                for k in range(n):
                    T[[i, j, j, k, i, k]] = 1.0
        A = Tensor.random([n, n])
        B = Tensor.random([n, n])
        i1, i2, i3, i4, i5, i6 = xe.indices(6)
        C1, C2 = Tensor(), Tensor()
        C1(i1, i3) << A(i1, i2) * B(i2, i3)
        C2(i5, i6) << T(i1, i2, i3, i4, i5, i6) * A(i1, i2) * B(i3, i4)
        assert np.allclose(C1.to_ndarray(), C2.to_ndarray(), atol=1e-12)
        assert np.allclose(C1.to_ndarray(),
                           A.to_ndarray() @ B.to_ndarray(), atol=1e-12)
        tt = TTTensor(T, eps=1e-12)
        assert max(tt.ranks()) <= n * n


def test_triple_index_misuse_raises():
    """An index appearing three or more times across a product is invalid
    (tensorNetwork.cxx triple_indices FAILTESTs)."""
    i1, i2, i3, i4 = xe.indices(4)
    A = Tensor.random([3, 3, 3])
    B = Tensor.random([3, 3])
    C = Tensor.random([3, 3])
    D = Tensor.random([3, 3])
    F = Tensor.random([3, 3])
    for expr in (
        lambda: float(A(i1, i1, i2) * B(i2, i2)),
        lambda: float(A(i1, i2, i2) * B(i2, i1)),
        lambda: float(A(i2, i2, i2) * B(i1, i1)),
        lambda: float(B(i1, i2) * C(i2, i3) * D(i3, i2)),
        lambda: float(B(i1, i2) * C(i2, i3) * D(i1, i2)),
        lambda: float(B(i1, i2) * C(i2, i3) * D(i3, i4) * F(i4, i2)),
    ):
        with pytest.raises(ValueError):
            expr()


def test_multi_node_trace_through_network():
    """tmp(i1,i2,i3,i4) = A(i1,i3)*B(i2,i4) then the double trace
    tmp(i1,i1,i2,i2) (tensorNetwork.cxx contraction_multi_node_trace)."""
    A = Tensor.random([1, 10])
    B = Tensor.random([1, 10])
    i1, i2, i3, i4 = xe.indices(4)
    tmp = xe.TensorNetwork()
    tmp(i1, i2, i3, i4) << A(i1, i3) * B(i2, i4)
    val = float(tmp(i1, i1, i2, i2))
    # i1 traces the (1,1) mode pair; i2 traces the (10,10) pair -> dot
    ref = float(np.dot(A.to_ndarray()[0], B.to_ndarray()[0]))
    assert np.isclose(val, ref, atol=1e-12)
