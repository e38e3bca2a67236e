"""Index-semantics failure tests (intent of indices.cxx) + PA counters
(xPerformanceAnalysis.cxx)."""

import numpy as np
import pytest

import xerus_tpu as xe
from xerus_tpu import Tensor
from xerus_tpu.misc import performance as perf


def test_invalid_span_pow():
    A = Tensor.random([10, 10])
    i, j = xe.indices(2)
    out = Tensor()
    with pytest.raises(Exception):
        out(i, j ^ 2) << A(j ^ 2, i)


def test_invalid_span_and():
    A = Tensor.random([10, 10])
    i, j = xe.indices(2)
    out = Tensor()
    with pytest.raises(Exception):
        out(i, j) << A(j, i & 0)


def test_invalid_span_fraction_one():
    A = Tensor.random([10, 10])
    i, j = xe.indices(2)
    out = Tensor()
    with pytest.raises(Exception):
        out(i, j) << A(j, i / 1)


def test_invalid_span_fraction_nondivisible():
    A = Tensor.random([10, 10])
    i, j = xe.indices(2)
    out = Tensor()
    with pytest.raises(Exception):
        out(i, j) << A(j, i / 3)


def test_no_implicit_batching():
    """c(j) = A(i,j)*b(j) is illegal: j is used three times (indices.cxx)."""
    A = Tensor.random([10, 10])
    b = Tensor.random([10])
    i, j = xe.indices(2)
    c = Tensor()
    with pytest.raises(Exception):
        c(j) << A(i, j) * b(j)


def test_index_equality_and_fixed():
    i = xe.Index()
    i2 = i ^ 2
    assert i == i2  # same id, span modifiers don't change identity
    from xerus_tpu.indexing.index import as_index
    f1, f2 = as_index(3), as_index(3)
    assert f1 != f2  # fixed indices never compare equal (index.h:160)


def test_performance_analysis_counters():
    perf.enable(True)
    perf.clear_analysis()
    with perf.pa_section("Dense", "GEMM", "64x64"):
        pass
    with perf.pa_section("Dense", "GEMM", "64x64"):
        pass
    report = perf.get_analysis()
    perf.enable(False)
    assert "Dense" in report and "GEMM(64x64): 2 calls" in report


def test_performance_analysis_wired_into_dispatch():
    """get_analysis() after real library work must be non-empty: the
    reference wraps every kernel invocation in XERUS_PA_START/END
    (blasLapackWrapper.cpp:582, sparseTimesFullContraction.cpp:94); our
    dispatch layer (core/contract.py, core/factorizations.py, the
    ops/tt_kernels jit wrapper) feeds the same group->name->param map."""
    import numpy as np
    from xerus_tpu import Tensor, TTTensor, TTOperator

    perf.enable(True)
    perf.clear_analysis()
    try:
        # dense contraction + factorization + solve through the Tensor core
        a = Tensor.random([6, 6])
        b = Tensor.random([6, 6])
        from xerus_tpu.core.contract import contract
        from xerus_tpu.core import factorizations as fact
        contract(a, b, 1)
        fact.calculate_svd(a, 1)
        fact.calculate_qr(a, 1)
        fact.solve(a, Tensor.random([6]))
        # an ALS solve exercises the jitted TT-kernel dispatch wrapper
        dims = [2] * 4
        A = TTOperator.identity(dims + dims)
        x = TTTensor.random(dims, 2)
        rhs = TTTensor.random(dims, 2)
        import xerus_tpu as xe
        xe.ALS_SPD(A, x, rhs, 2)
        report = perf.get_analysis()
    finally:
        perf.enable(False)
        perf.clear_analysis()
    assert "Dense BLAS" in report
    assert "Matrix-Matrix-Multiplication" in report
    assert "Singular Value Decomposition(6x6)" in report
    assert "QR Factorisation(6x6)" in report
    assert "TT Kernels" in report, report


def test_nan_guard():
    from xerus_tpu.misc.profiling import guard_finite
    from xerus_tpu.config import config
    import jax.numpy as jnp
    old = config.nan_checks
    config.nan_checks = True
    try:
        guard_finite(jnp.ones((3,)))  # fine
        with pytest.raises(FloatingPointError):
            guard_finite(jnp.array([1.0, float("nan")]), "test")
    finally:
        config.nan_checks = old
