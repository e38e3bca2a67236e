"""Misc-layer tests (intent of misc.cxx, fileIO.cxx, saveAndLoad.cxx)."""

import math
import os

import numpy as np
import pytest

import xerus_tpu as xe
from xerus_tpu import Tensor, FileFormat, LogHistogram


def test_log_histogram_basic():
    h = LogHistogram(2.0)
    h.add(1.5)   # bucket 0
    h.add(3.0)   # bucket 1
    h.add(3.9)   # bucket 1
    assert h.buckets[0] == 1 and h.buckets[1] == 2
    assert h.total_count() == 3


def test_log_histogram_merge_and_io(tmp_path):
    h = LogHistogram(1.7)
    for x in [0.1, 0.5, 2.0, 30.0]:
        h.add(x)
    h2 = LogHistogram(1.7)
    h2.add(0.1)
    h += h2
    p = str(tmp_path / "hist.tsv")
    h.dump_to_file(p)
    back = LogHistogram.read_from_file(p)
    assert back.total_count() == h.total_count()
    assert back.buckets == h.buckets


def test_tensor_save_load_binary(tmp_path):
    t = Tensor.random([3, 4, 5])
    p = str(tmp_path / "t.xtpu")
    xe.save_to_file(t, p)
    back = xe.load_from_file(p)
    assert back.dimensions == t.dimensions
    assert np.allclose(back.to_ndarray(), t.to_ndarray())


def test_tensor_save_load_tsv(tmp_path):
    t = Tensor.random([4, 4])
    t *= 2.5
    p = str(tmp_path / "t.txt")
    xe.save_to_file(t, p, FileFormat.TSV)
    back = xe.load_from_file(p)
    assert np.allclose(back.to_ndarray(), t.to_ndarray())


def test_sparse_tensor_save_load(tmp_path):
    t = Tensor.random([10, 10], n=7)
    p = str(tmp_path / "s.xtpu")
    xe.save_to_file(t, p)
    back = xe.load_from_file(p)
    assert back.is_sparse()
    assert np.allclose(back.to_ndarray(), t.to_ndarray())


def test_load_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.xtpu")
    with open(p, "w") as f:
        f.write("not a datafile\n")
    with pytest.raises(Exception):
        xe.load_from_file(p)


def test_deterministic_seed():
    xe.set_seed(123)
    a = Tensor.random([3, 3]).to_ndarray()
    xe.set_seed(123)
    b = Tensor.random([3, 3]).to_ndarray()
    assert np.array_equal(a, b)


def test_tensor_network_save_load(tmp_path):
    import xerus_tpu as xe
    A = Tensor.random([3, 4]); B = Tensor.random([4, 5])
    i, j, k = xe.indices(3)
    net = xe.TensorNetwork()
    net(i, k) << A(i, j) * B(j, k)
    p = str(tmp_path / "net.xtpu")
    xe.save_to_file(net, p)
    back = xe.load_from_file(p)
    assert isinstance(back, xe.TensorNetwork)
    back.require_valid_network()
    assert np.allclose(back.to_tensor().to_ndarray(), net.to_tensor().to_ndarray())


def test_solver_checkpointing(tmp_path):
    """Checkpoint/resume: PerformanceData saves the iterate during a solve
    (new design, SURVEY.md §5.4)."""
    from xerus_tpu import TTTensor, TTOperator
    p = str(tmp_path / "ckpt.xtpu")
    dims = [3] * 3
    A = TTOperator.identity(dims + dims)
    b = TTTensor.random(dims, 2)
    x = TTTensor.random(dims, 2)
    perf = xe.PerformanceData(checkpoint_path=p, checkpoint_every=1)
    xe.ALS_SPD(A, x, b, 1e-10, perf)
    assert len(perf.data) > 0
    restored = xe.load_from_file(p)
    assert isinstance(restored, TTTensor)
    restored.require_correct_format()
    # resume: restored iterate continues the solve
    resid = xe.ALS_SPD(A, restored, b, 1e-12)
    assert resid < 1e-8


@pytest.mark.slow
def test_warmup_precompiles_kernels():
    """xe.warmup compiles the whole-sweep kernels once; a second call for
    the same family hits the lru-cached jits and is near-instant."""
    import time
    t1 = xe.warmup([2] * 5, 4, target_rank=2, dtype="float64",
                   num_measurements=8)
    assert set(t1) == {"round_gram", "round_svd", "round_randomized",
                       "als_lr", "als_rl", "adf_iteration"}
    t0 = time.perf_counter()
    xe.warmup([2] * 5, 4, target_rank=2, dtype="float64", num_measurements=8)
    assert time.perf_counter() - t0 < max(1.0, sum(t1.values()) / 3)


def test_ring_buffer_log_on_error():
    """LOGGING_ON_ERROR parity: debug records are buffered silently and
    flushed to the target only when an ERROR arrives."""
    import logging

    class Capture(logging.Handler):
        def __init__(self):
            super().__init__()
            self.records = []

        def emit(self, record):
            self.records.append(record.getMessage())

    cap = Capture()
    h = xe.misc.enable_log_on_error(capacity=8, target=cap)
    try:
        log = xe.misc.get_logger("ALS")
        for i in range(12):
            log.debug("step %d", i)
        assert cap.records == []                     # nothing flushed yet
        assert len(h.dump()) == 8                    # ring capacity holds
        log.error("boom")
        # the last 8 debug records + the error itself were flushed
        assert cap.records[-1] == "boom"
        assert "step 11" in cap.records
        assert "step 3" not in cap.records           # evicted from the ring
    finally:
        xe.misc.get_logger().removeHandler(h)


def test_require_coverage_landmarks(tmp_path, monkeypatch):
    """XERUS_TEST_COVERAGE landmark machinery (reference test.h:40-51):
    executed require() sites are recorded; the reporter finds hits and
    misses against the scanned call sites."""
    import sys
    cfg = sys.modules["xerus_tpu.config"]   # the attribute shadows the module
    from xerus_tpu.misc import coverage

    monkeypatch.setattr(cfg, "_COVERAGE", True)
    saved = set(coverage._HITS)   # an XERUS_TEST_COVERAGE=1 suite run is
    coverage._HITS.clear()        # accumulating real hits — restore below
    try:
        cfg.require(True, "landmark")
        assert len(coverage._HITS) == 1
        hit_site = next(iter(coverage._HITS))
        assert __file__.split("/")[-1] in hit_site  # records the CALLER

        p = tmp_path / "hits.txt"
        coverage.dump(str(p))
        total, hit, missed = coverage.report([str(p)])
        assert total > 100      # the package is full of require() sites
        assert hit == 0         # our hit is in tests/, not the package
        sites = coverage.scan_sites()
        assert all(":" in s for s in sites)
    finally:
        coverage._HITS.update(saved)


def test_performance_data_get_histogram_convergence_rates():
    """get_histogram models x2 = x1 * 2^(-rate*dt_us) and buckets the decay
    rate weighted by dt (performanceData.cpp:110-140); assume_convergence
    measures residuals relative to the final point and drops it."""
    perf = xe.PerformanceData()
    perf.start()
    from xerus_tpu.algorithms.performance_data import DataPoint
    # synthetic trace: residual halves every 2us -> rate 0.5 per us
    for n, r in enumerate([1.0, 0.5, 0.25, 0.125]):
        perf.data.append(DataPoint(n, n * 2e-6, r, None, [1], 0))
    hist = perf.get_histogram(2.0)
    # rate = -log2(0.5)/2 = 0.5 -> bucket floor(log2(0.5)) = -1
    assert hist.buckets == {-1: 6}          # 3 steps x dt=2us each
    # assume_convergence: residuals relative to the final point (dropped):
    # [0.875, 0.375, 0.125] over 2us steps -> rates log2(7/3)/2, log2(3)/2
    hist2 = perf.get_histogram(2.0, True)
    assert hist2.total_count() == 4         # 2 steps x dt=2us each
    assert set(hist2.buckets) == {-1}       # both rates in [0.5, 1)
    # non-decreasing steps are skipped
    perf.data.append(DataPoint(4, 8e-6, 0.5, None, [1], 0))
    assert perf.get_histogram(2.0).total_count() == 6


def test_romberg_integration():
    """misc.integrate matches the reference oracles (misc.cxx
    romberg_integration)."""
    import math
    from xerus_tpu.misc import integrate
    npi = 2 * integrate(lambda x: math.sqrt(1 - x * x), -1, 1, 1e-16)
    assert abs(npi - math.pi) < 1e-13
    npi = 2 * integrate(lambda x: -math.sqrt(1 - x * x), -1, 1, 1e-16)
    assert abs(npi + math.pi) < 1e-13
    assert abs(integrate(lambda x: 1 - x, -1, 1, 1e-14) - 2.0) < 2e-14
    assert abs(integrate(lambda x: x ** 3 + 1e-14, -1, 1, 1e-14)
               - 2e-14) < 1e-14
    assert abs(integrate(math.cos, 0, 1, 1e-14) - math.sin(1)) < 2e-14
    # discontinuous integrand: adaptive splitting localizes the jump
    step = lambda x: 1.0 if 0 < x <= 1 else 0.0
    assert abs(integrate(step, -2, 2, 1e-14, 3) - 1.0) < 2e-10
    # reversed bounds flip the sign
    assert abs(integrate(math.cos, 1, 0, 1e-14) + math.sin(1)) < 2e-14


def test_orthogonal_polynomial_base():
    """Polynomial.build_orthogonal_base: orthonormal w.r.t. a weighted
    product (misc.cxx polynomial; used by the reference's UQ bases)."""
    import math
    from xerus_tpu.misc import Polynomial
    weight = lambda x: abs(math.sin(x))
    base = Polynomial.build_orthogonal_base(6, weight, -1, 1)
    for i, p in enumerate(base):
        assert p.terms() == i + 1
        assert abs(p.norm(weight, -1, 1) - 1.0) < 1e-10
        for j, q in enumerate(base):
            if i != j:
                assert abs(p.scalar_product(q, weight, -1, 1)) < 1e-9
    # legendre check: base over weight 1 matches normalized legendre P2
    b2 = Polynomial.build_orthogonal_base(3, lambda x: 1.0, -1, 1)[2]
    # P2 = (3x^2-1)/2, norm sqrt(2/5) -> normalized coeffs
    scale = b2.coefficients[2] / (1.5 / math.sqrt(2.0 / 5.0))
    assert abs(abs(scale) - 1.0) < 1e-8


def test_sequence_limit_extractors():
    from xerus_tpu.misc import ShanksTransformation, RichardsonExtrapolation
    # geometric approach x_n = 1 + 0.5^n: shanks nails it from 3 terms
    sh = ShanksTransformation()
    for n in range(6):
        sh.push_back(1.0 + 0.5 ** n)
    assert abs(sh.best_estimate() - 1.0) < 1e-10
    assert sh.error_approximate() < 1e-6
    # richardson: the static formula eliminates an exact alpha/(n+1) term
    # ((n+1)*x2 - n*x1 with x_k = L + a/(k+1) gives L exactly); the
    # cascaded push_back mirrors the reference loop verbatim
    # (simpleNumerics.cpp:305-317 — which the reference never unit-tests)
    # x_k = L + a/k: (n+1)*x_{n+1} - n*x_n = L exactly
    assert abs(RichardsonExtrapolation.richard(3, 2.0 + 1.0 / 3,
                                               2.0 + 1.0 / 4) - 2.0) < 1e-12
    ri = RichardsonExtrapolation()
    ri.push_back(3.0)
    ri.push_back(2.5)
    assert abs(ri.best_estimate() - 2.5) < 1e-12  # richard(0,.) == x2
    ri.reset()
    import pytest
    with pytest.raises(ValueError):
        ri.best_estimate()


def test_find_root_bisection():
    import math
    from xerus_tpu.misc import find_root_bisection
    r = find_root_bisection(lambda x: x * x - 2.0, 0, 2)
    assert abs(r - math.sqrt(2)) < 1e-12
    import pytest
    with pytest.raises(ValueError):
        find_root_bisection(lambda x: x * x + 1.0, -1, 1)


def test_reference_binding_exact_names():
    """The reference python module's exact (camelCase) names resolve:
    python/tensorNetwork.cpp:41-121 (nodes/externalLinks/tensorObject/
    TensorNetworkLink.indexPosition, contract overloads),
    python/leastSquares.cpp:36-79 (PerformanceData.data/errorFunction,
    DataPoint fields), python/factorizations.cpp:31 (TensorFactorisation),
    python/indexedTensor.cpp:36,119 (__div__)."""
    import numpy as np
    import xerus_tpu as xe

    assert xe.TensorFactorisation is not None
    assert xe.TensorNetworkLink is xe.network.network.Link

    tn = xe.TTTensor.random([2, 2, 2], 2).copy_as_network()
    assert len(tn.externalLinks) == 3
    nd = tn.nodes[1]
    assert nd.tensorObject is nd.tensor
    lk = next(l for l in nd.neighbors if not l.external)
    assert lk.indexPosition == lk.index_position

    # contract(id1, id2) and contract(set) overloads
    t2 = xe.TTTensor.random([2, 2, 2], 2)
    tn2 = t2.copy_as_network()
    alive = [i for i, n in enumerate(tn2.nodes) if not n.erased]
    sid = tn2.contract(set(alive))
    full = tn2.nodes[sid].tensor.to_ndarray().reshape(-1)
    ref = t2.to_tensor().to_ndarray().reshape(-1)
    assert np.allclose(full, ref, atol=1e-10)

    pd = xe.PerformanceData()
    pd.errorFunction = lambda x: 0.5
    assert pd.error_function(None) == 0.5
    pd.start()
    pd.add(1.0, x=xe.TTTensor.random([2, 2], 1))
    p = pd.data[0]
    assert p.iterationCount == p.iteration
    assert p.elapsedTime == p.elapsed_time
    assert p.error == 0.5

    i = xe.Index()
    half = i.__div__(2)
    assert half.fractional_span and half.span == 2

    A = xe.Tensor.random([3, 3])
    out = xe.Tensor([3, 3])
    j, k = xe.indices(2)
    out(j, k) << A(j, k).__div__(2.0)
    assert np.allclose(out.to_ndarray(), A.to_ndarray() / 2.0, atol=1e-12)
