"""FAILTEST-style negative tests: every user-reachable require() failure
branch raises cleanly (reference test style, e.g. fullTensor_*.cxx
FAILTEST; landmark list from `python -m xerus_tpu.misc.coverage`)."""

import numpy as np
import pytest

import xerus_tpu as xe
from xerus_tpu import Tensor, TTTensor, TTOperator


def test_ttoperator_odd_dimensions():
    with pytest.raises(ValueError, match="even"):
        TTOperator([2, 2, 2])


def test_rank_and_component_index_guards():
    t = TTTensor.random([2, 3, 4], 2)
    with pytest.raises(ValueError, match="illegal rank index"):
        t.rank(2)
    with pytest.raises(ValueError, match="illegal component"):
        t.get_component(3)
    with pytest.raises(ValueError, match="illegal component"):
        t.set_component(-1, Tensor.random([1, 2, 1]))
    with pytest.raises(ValueError, match="degree"):
        t.set_component(0, Tensor.random([2, 2]))  # needs degree 3
    with pytest.raises(ValueError, match="chop position"):
        t.chop(7)


def test_degree_zero_tt_format_check():
    # happy path of the degree-0 require_correct_format branch
    t = TTTensor(0)
    t.require_correct_format()


def test_inner_dimension_mismatch():
    from xerus_tpu.tt.ttnetwork import inner
    a = TTTensor.random([2, 3], 2)
    b = TTTensor.random([3, 2], 2)
    with pytest.raises(ValueError, match="dimension mismatch"):
        inner(a, b)


def test_solve_expression_index_guards():
    i, j, k = xe.indices(3)
    A = Tensor.random([3, 3])
    b = Tensor.random([3])
    b2 = Tensor.random([3, 3])
    x = xe.Tensor()
    # solve syntax is b / A; A(i,j) carries none of b's open indices
    l = xe.indices(1)[0]
    with pytest.raises(ValueError, match="solve"):
        x() << b2(k, l) / A(i, j)
    # LHS index does not match A's free index
    with pytest.raises(ValueError, match="solve"):
        x(k) << b(i) / A(i, j)


def test_factorisation_target_guards():
    i, j, r, r2 = xe.indices(4)
    A = Tensor.random([4, 5])
    Q, R, S = xe.Tensor(), xe.Tensor(), xe.Tensor()
    with pytest.raises(ValueError, match="needs two targets"):
        (Q(i, r),) << xe.QR(A(i, j))
    with pytest.raises(ValueError, match=r"SVD needs \(U, S, Vt\)"):
        (Q(i, r), R(r, j)) << xe.SVD(A(i, j))
    # fixed index on a factorisation target (plain int = FIXED)
    with pytest.raises(ValueError, match="fixed indices"):
        (Q(2, r), R(r, j)) << xe.QR(A(i, j))
    # rank index with span > 1 (via ^)
    with pytest.raises(ValueError):
        (Q(i, r & 2), R(r & 2, j)) << xe.QR(A(i, j))
    # source index span mismatch on the target
    with pytest.raises(ValueError):
        (Q(i & 2, r), R(r, j)) << xe.QR(A(i, j))


def test_factorisation_source_and_target_types():
    i, j, r = xe.indices(3)
    A = Tensor.random([3, 3])
    with pytest.raises(ValueError, match="factorisation source"):
        xe.QR(A)          # not an IndexedTensor
    f = xe.QR(A(i, j))
    with pytest.raises(ValueError, match="targets must be a tuple"):
        f.__rlshift__("bad")


def test_entrywise_compare_dimension_guard():
    from xerus_tpu.core.tensor import approx_entrywise_equal
    a = Tensor.random([2, 3])
    b = Tensor.random([3, 2])
    with pytest.raises(ValueError, match="entrywise compare"):
        approx_entrywise_equal(a, b)


def test_retraction_set_base_dimension_guard():
    from xerus_tpu.algorithms.retractions import TTTangentVector
    x = TTTensor.random([2, 3], 2)
    g = TTTensor.random([2, 3], 2)
    tv = TTTangentVector(x, g)
    with pytest.raises(ValueError, match="dimension mismatch"):
        tv.set_base(TTTensor.random([3, 2], 2))


def test_network_erased_node_guard():
    from xerus_tpu.network.network import TensorNetwork
    tn = TensorNetwork(Tensor.random([2, 2]))
    tn.nodes[0].erase()
    with pytest.raises(ValueError):
        tn.require_valid_network()


def test_eigensolver_argument_guards():
    from xerus_tpu.algorithms import smallest_eigenvalue
    from xerus_tpu.algorithms.eigensolver import EigenALSVariant
    from xerus_tpu.examples import heisenberg_mpo
    H = heisenberg_mpo(4)
    x = TTTensor.random([2] * 4, 2)
    with pytest.raises(ValueError, match="unknown solver"):
        smallest_eigenvalue(H, x, solver="qr")
    with pytest.raises(ValueError, match="two-site only"):
        smallest_eigenvalue(H, x, sites=1, solver="lanczos")
    from xerus_tpu.examples.generators import laplace_operator
    A_nu = laplace_operator([2, 3, 2, 3])
    x_nu = TTTensor.random([2, 3, 2, 3], 2)
    with pytest.raises(ValueError, match="uniform mode"):
        smallest_eigenvalue(A_nu, x_nu, solver="lanczos")
    v = EigenALSVariant(sites=3)
    with pytest.raises(ValueError, match="sites must be 1 or 2"):
        v.solve(H, x, 1, 1e-8)
    with pytest.raises(ValueError, match="TT too short"):
        EigenALSVariant(sites=2).solve(heisenberg_mpo(2), TTTensor([2]), 1,
                                       1e-8)


def test_measurement_set_position_mode_count_guard():
    from xerus_tpu.algorithms.measurements import RankOneMeasurementSet
    r1 = RankOneMeasurementSet()
    r1.add([np.ones(2), np.ones(3)], 1.0)
    with pytest.raises(ValueError, match="one weight vector per mode"):
        r1.set_position(0, [np.ones(2)])


def test_asd_two_site_guard():
    from xerus_tpu.algorithms.als import ALSVariant
    from xerus_tpu.examples.generators import laplace_operator
    A = laplace_operator([2] * 4)
    x = TTTensor.random([2] * 4, 2)
    b = TTTensor.random([2] * 4, 2)
    asd2 = ALSVariant(2, 0, "asd", True)
    with pytest.raises(ValueError, match="single-site"):
        asd2(A, x, b)


def test_zero_and_degree_zero_tt_are_correct_format():
    """Freshly constructed zero TTs are canonicalized by fiat
    (ttNetwork.cpp:58): require_correct_format must accept the all-zero
    frames and the degree-0 scalar component."""
    TTTensor(0).require_correct_format()
    z = TTTensor([2, 3, 4])
    z.require_correct_format()
    assert z.frob_norm() == 0.0
    TTOperator([2, 2]).require_correct_format()


def test_tt_svd_and_unfolding_guards():
    with pytest.raises(ValueError, match="even"):
        TTOperator(Tensor.random([2, 2, 2]))
    with pytest.raises(ValueError, match="eps"):
        TTTensor(Tensor.random([2, 2]), eps=1.5)
    with pytest.raises(ValueError, match="maxRanks"):
        TTTensor(Tensor.random([2, 2, 2]), max_ranks=[4])
    with pytest.raises(ValueError, match="TTTensor only"):
        TTOperator.from_dense_unfolding(Tensor.random([2, 2]))


def test_move_core_and_round_guards():
    t = TTTensor.random([2, 3, 4], 2)
    with pytest.raises(ValueError, match="position"):
        t.move_core(5)
    with pytest.raises(ValueError, match="maxRanks"):
        t.round([2])          # needs 2 entries
    with pytest.raises(ValueError, match="eps"):
        t.round(2, eps=1.0)
    with pytest.raises(ValueError, match="rank 0"):
        t.round([2, 0])
    with pytest.raises(ValueError, match="maxRanks"):
        t.round_fast([2])
    with pytest.raises(ValueError, match="rank 0"):
        t.round_fast([2, 0])
    with pytest.raises(ValueError, match="rank 0"):
        t.round_fast(0)
    with pytest.raises(ValueError, match="taus"):
        t.soft_threshold([0.1])


def test_tt_arithmetic_type_and_dim_guards():
    a = TTTensor.random([2, 3], 2)
    b = TTTensor.random([3, 2], 2)
    op = TTOperator.identity([2, 3, 2, 3])
    from xerus_tpu.tt.ttnetwork import (entrywise_product, dyadic_product,
                                        apply_operator)
    with pytest.raises(ValueError, match="same TT type"):
        a += op
    with pytest.raises(ValueError, match="dimension"):
        a += b
    with pytest.raises(ValueError, match="same TT type"):
        entrywise_product(a, op)
    with pytest.raises(ValueError, match="dimension mismatch"):
        entrywise_product(a, b)
    with pytest.raises(ValueError, match="same TT type"):
        dyadic_product(a, op)
    with pytest.raises(ValueError, match="length mismatch"):
        apply_operator(op, TTTensor.random([2, 3, 4], 2))
    with pytest.raises(ValueError, match="matching dims"):
        TTOperator.identity([2, 3])
    with pytest.raises(ValueError, match="fix_mode"):
        op.fix_mode(0, 0)
    with pytest.raises(ValueError, match="transpose"):
        a.transpose()
    with pytest.raises(ValueError, match="wrong number of positions"):
        a[[0, 1, 0]]
