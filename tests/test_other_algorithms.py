"""decomposition_als, largest entry, uq_adf tests (intent of
decompositionAls.cxx, largestEntry.cxx)."""

import numpy as np
import pytest

import xerus_tpu as xe
from xerus_tpu import Tensor, TTTensor


def test_decomposition_als_exact_rank():
    dims = [4, 4, 4]
    target_tt = TTTensor.random(dims, 2)
    target = target_tt.to_tensor()
    x = TTTensor.random(dims, 2)
    xe.decomposition_als(x, target)
    assert np.allclose(x.to_tensor().to_ndarray(), target.to_ndarray(), atol=1e-8)


def test_decomposition_als_truncating():
    dims = [4, 4, 4]
    target = Tensor.random(dims)
    x = TTTensor.random(dims, 2)
    xe.decomposition_als(x, target)
    # result must be the (quasi-)best rank-2 approximation: compare against
    # TT-SVD truncation error within a factor
    tt_svd = TTTensor(target, eps=0.0, max_ranks=[2, 2])
    err_als = np.linalg.norm(x.to_tensor().to_ndarray() - target.to_ndarray())
    err_svd = np.linalg.norm(tt_svd.to_tensor().to_ndarray() - target.to_ndarray())
    assert err_als < 2.0 * err_svd + 1e-12


def test_find_largest_entry_rank_one():
    dims = [3, 4, 3]
    tt = TTTensor.dirac(dims, [1, 2, 0])
    tt *= 5.0
    pos = xe.find_largest_entry(tt)
    assert pos == Tensor.multiIndex_to_position([1, 2, 0], dims)


def test_find_largest_entry_general():
    dims = [4] * 4
    tt = TTTensor.random(dims, 2)
    arr = np.abs(tt.to_tensor().to_ndarray())
    true_pos = int(np.argmax(arr))
    found = xe.find_largest_entry(tt, accuracy=0.1)
    found_val = arr.reshape(-1)[found]
    # the algorithm guarantees a (1-accuracy) approximation of the max
    assert found_val >= (1 - 0.2) * arr.reshape(-1)[true_pos]

    # the iterative squaring/soft-threshold path (used above the
    # materialization cutoff; largestEntry.cpp:30-54) keeps the same
    # contract on the same instance
    from xerus_tpu.algorithms.largest_entry import _find_largest_entry
    found_it = _find_largest_entry(tt, 0.1, 0.0)
    assert arr.reshape(-1)[found_it] >= (1 - 0.2) * arr.reshape(-1)[true_pos]


def test_uq_randvar_embedding():
    p = xe.algorithms.randvar_to_position(0.7, 4)
    # probabilists' Hermite: 1, v, v^2-1, v^3-3v
    assert np.allclose(p, [1.0, 0.7, 0.7 ** 2 - 1, 0.7 ** 3 - 3 * 0.7])


def test_uq_adf_reconstructs():
    """UQ-ADF on samples generated from a known UQ TT."""
    dims = [4, 3, 3]  # physical mode 4; two stochastic modes of degree 3
    truth = TTTensor.random(dims, 2)
    truth /= truth.frob_norm()
    rng = xe.misc.randomEngine
    rvs, sols = [], []
    for _ in range(120):
        rv = [float(rng.normal()), float(rng.normal())]
        w1 = xe.algorithms.randvar_to_position(rv[0], 3)
        w2 = xe.algorithms.randvar_to_position(rv[1], 3)
        arr = truth.to_tensor().to_ndarray()
        sol = np.einsum('abc,b,c->a', arr, w1, w2)
        rvs.append(rv)
        sols.append(Tensor.from_ndarray(sol))
    x = TTTensor.random(dims, 2)
    xe.uq_adf(x, rvs, sols)
    # check prediction errors on the training samples
    errs = []
    for rv, sol in zip(rvs[:20], sols[:20]):
        w1 = xe.algorithms.randvar_to_position(rv[0], 3)
        w2 = xe.algorithms.randvar_to_position(rv[1], 3)
        pred = np.einsum('abc,b,c->a', x.to_tensor().to_ndarray(), w1, w2)
        errs.append(np.linalg.norm(pred - sol.to_ndarray()))
    assert np.mean(errs) < 1e-3


def test_uq_mc_and_avg():
    dims = [4, 3, 3]
    tt = TTTensor.random(dims, 2)
    rvs, sols = xe.uq_mc(tt, 10)
    assert len(rvs) == 10 and len(sols) == 10
    assert sols[0].dimensions == [4]
    avg = xe.uq_avg(tt, 50)
    assert avg.dimensions == [4]


def test_uq_adf_measurement_set_with_initial():
    """uq_adf(UQMeasurementSet, guess) with axis-aligned initial samples
    (uqAdf.cpp:334-407)."""
    dims = [3, 3, 3]
    truth = TTTensor.random(dims, 2)
    truth /= truth.frob_norm()
    rng = xe.misc.randomEngine
    ms = xe.UQMeasurementSet()
    arr = truth.to_tensor().to_ndarray()

    def sample(rv):
        w1 = xe.algorithms.randvar_to_position(rv[0], 3)
        w2 = xe.algorithms.randvar_to_position(rv[1], 3)
        return np.einsum('abc,b,c->a', arr, w1, w2)

    # axis-aligned initial samples (rv[m][m] > 0, zeros elsewhere)
    ms.add_initial([1.0, 0.0], xe.Tensor.from_ndarray(sample([1.0, 0.0])))
    ms.add_initial([0.0, 1.0], xe.Tensor.from_ndarray(sample([0.0, 1.0])))
    for _ in range(80):
        rv = [float(rng.normal()), float(rng.normal())]
        ms.add(rv, xe.Tensor.from_ndarray(sample(rv)))
    guess = TTTensor.random(dims, 2)
    x = xe.uq_adf(ms, guess)
    errs = []
    for _ in range(10):
        rv = [float(rng.normal()), float(rng.normal())]
        w1 = xe.algorithms.randvar_to_position(rv[0], 3)
        w2 = xe.algorithms.randvar_to_position(rv[1], 3)
        pred = np.einsum('abc,b,c->a', x.to_tensor().to_ndarray(), w1, w2)
        errs.append(np.linalg.norm(pred - sample(rv)))
    assert np.mean(errs) < 1e-2
