"""Tangent vectors, retractions, SD, CG tests (intent of retractions.cxx,
steepestDescent.cxx, cg.cxx)."""

import numpy as np
import pytest

import xerus_tpu as xe
from xerus_tpu import Tensor, TTTensor, TTOperator, TTTangentVector
from xerus_tpu.examples import laplace_operator


def test_tangent_vector_projection_idempotent():
    """Projecting a tangent vector again must be (nearly) the identity."""
    dims = [3] * 4
    base = TTTensor.random(dims, 2)
    direction = TTTensor.random(dims, 2)
    tv = TTTangentVector(base, direction)
    tt = tv.to_tttensor()
    tv2 = TTTangentVector(base, tt)
    tt2 = tv2.to_tttensor()
    assert np.allclose(tt.to_tensor().to_ndarray(), tt2.to_tensor().to_ndarray(),
                       atol=1e-8)


def test_tangent_vector_scalar_product_vs_dense():
    dims = [3] * 3
    base = TTTensor.random(dims, 2)
    d1 = TTTensor.random(dims, 2)
    d2 = TTTensor.random(dims, 2)
    t1 = TTTangentVector(base, d1)
    t2 = TTTangentVector(base, d2)
    dense1 = t1.to_tttensor().to_tensor().to_ndarray()
    dense2 = t2.to_tttensor().to_tensor().to_ndarray()
    assert np.isclose(t1.scalar_product(t2), np.sum(dense1 * dense2), atol=1e-8)
    assert np.isclose(t1.frob_norm(), np.linalg.norm(dense1), atol=1e-8)


def test_tangent_of_base_is_base():
    """The projection of the base itself onto its tangent space is the base."""
    dims = [3] * 3
    base = TTTensor.random(dims, 2)
    tv = TTTangentVector(base, base)
    assert np.allclose(tv.to_tttensor().to_tensor().to_ndarray(),
                       base.to_tensor().to_ndarray(), atol=1e-10)


def test_added_to_base():
    dims = [3] * 3
    base = TTTensor.random(dims, 2)
    direction = TTTensor.random(dims, 2)
    tv = TTTangentVector(base, direction)
    total = tv.added_to_base()
    expect = base.to_tensor().to_ndarray() + tv.to_tttensor().to_tensor().to_ndarray()
    assert np.allclose(total.to_tensor().to_ndarray(), expect, atol=1e-10)


@pytest.mark.parametrize("retraction", [xe.SubmanifoldRetractionI,
                                        xe.HOSVDRetractionI,
                                        xe.ALSRetractionI])
def test_retractions_first_order(retraction):
    """Retraction(x, t*v) = x + t*v + O(t^2) (retractions.cxx oracle)."""
    dims = [3] * 3
    base = TTTensor.random(dims, 2)
    base /= base.frob_norm()
    direction = TTTensor.random(dims, 2)
    tv = TTTangentVector(base, direction)
    tangent_dense = tv.to_tttensor().to_tensor().to_ndarray()
    base_dense = base.to_tensor().to_ndarray()

    def error_at(t):
        stepped = base.copy()
        retraction(stepped, tv * t)
        return np.linalg.norm(stepped.to_tensor().to_ndarray()
                              - (base_dense + t * tangent_dense))

    t = 1e-3
    e1, e2 = error_at(t), error_at(t / 2)
    # first-order retraction: error is O(t^2), so halving t quarters it
    assert e1 < 1e-2
    assert e2 < e1 / 2.5


def test_vector_transport_preserves_tangency():
    dims = [3] * 3
    base = TTTensor.random(dims, 2)
    direction = TTTensor.random(dims, 2)
    tv = TTTangentVector(base, direction)
    new_base = TTTensor.random(dims, 2)
    xe.ProjectiveVectorTransport(new_base, tv)
    # transported vector must lie in the tangent space at new_base:
    # re-projection is identity
    tt = tv.to_tttensor()
    tv2 = TTTangentVector(new_base, tt)
    assert np.allclose(tv2.to_tttensor().to_tensor().to_ndarray(),
                       tt.to_tensor().to_ndarray(), atol=1e-8)


def test_steepest_descent_identity():
    dims = [2] * 4
    A = TTOperator.identity(dims + dims)
    b = TTTensor.random(dims, 2)
    b /= b.frob_norm()
    x = TTTensor.random(dims, 2)
    variant = xe.SteepestDescentVariant(30, 1e-10, True)
    resid = variant(A, x, b, 30)
    assert resid < 1e-4


def test_steepest_descent_no_operator():
    dims = [3] * 3
    b = TTTensor.random(dims, 2)
    x = TTTensor.random(dims, 2)
    variant = xe.SteepestDescentVariant(30, 1e-12, False)
    resid = variant(x, b, 30)
    assert resid < 1e-6


def test_cg_poisson():
    dims = [3] * 3
    A = laplace_operator(dims)
    b = xe.TTTensor.ones(dims)
    b /= b.frob_norm()
    x = TTTensor.random(dims, 3)
    A_mat = A.to_tensor().to_ndarray().reshape(27, 27)
    b_vec = b.to_tensor().to_ndarray().reshape(-1)
    start = np.linalg.norm(
        A_mat @ x.to_tensor().to_ndarray().reshape(-1) - b_vec)
    variant = xe.GeometricCGVariant(40, 1e-10, True)
    resid = variant(A, x, b, 40)
    end = np.linalg.norm(A_mat @ x.to_tensor().to_ndarray().reshape(-1) - b_vec)
    # geometric CG is first-order: require a large residual reduction
    # (the reference ships its cg.cxx test commented out — no rate oracle)
    # 10x: the bar is arbitrary (no reference oracle); fixing the
    # ones()-constructor canonical claim changed ||b|| and thus this
    # instance's scaling (x0 is not scaled with b), moving the measured
    # reduction from ~25x to ~13.6x for the same solver behavior
    assert end < start / 10
