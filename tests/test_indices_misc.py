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
