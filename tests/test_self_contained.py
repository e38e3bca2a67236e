"""Port of the reference's randomized "SelfContained" consistency test
(/root/reference/src/unitTests/tensors.cxx:27-121) plus the remaining
Arithmetic_Negatives FAILTESTs (fullTensor_arithmetic.cxx:25-44).

Ten indices with random spans 0..3 and per-mode dims 1..4 drive a five-node
network of dense and sparse tensors; two algebraic identities must contract
to (numerically) zero through the expression frontend:

  [(A1+A2) + (A3-A2) - (A1+A3)] * B1 * C1 * D1 * E1           == 0
  A1*B1*[(C1+C2)(D1+D2) + (C1-C2)(D1-D2) - 2*C1*D1 - 2*C2*D2] * E1 == 0

This exercises span-0 indices, sparse+dense mixing inside sums, sums of
multi-term products, and scalar (degree-0) results in one surface.
"""

import numpy as np
import pytest

import xerus_tpu as xe
from xerus_tpu import Tensor


def _span_dims(rng, n_idx=10, max_span=3, max_dim=4):
    spans = [int(rng.integers(0, max_span + 1)) for _ in range(n_idx)]
    dims = [[int(rng.integers(1, max_dim + 1)) for _ in range(s)] for s in spans]
    return spans, dims


def _rand(rng, dims, sparse_div=None):
    size = int(np.prod([d for grp in dims for d in grp], dtype=np.int64)) if dims else 1
    flat = [d for grp in dims for d in grp]
    if sparse_div is None:
        return Tensor.random(flat, generator=rng)
    return Tensor.random(flat, n=size // sparse_div, generator=rng)


@pytest.mark.parametrize("run", range(10))
def test_self_contained_identities(run):
    rng = np.random.default_rng(0xBAADF00D + run)
    spans, dims = _span_dims(rng)
    ii = xe.indices(10)

    def arg(t, *idx_nums):
        return t(*[ii[n] ** spans[n] for n in idx_nums])

    A1 = _rand(rng, [dims[0], dims[1], dims[2], dims[3]])
    A2 = _rand(rng, [dims[0], dims[1], dims[2], dims[3]], sparse_div=13)
    A3 = _rand(rng, [dims[0], dims[1], dims[2], dims[3]], sparse_div=20)
    B1 = _rand(rng, [dims[1], dims[4], dims[5], dims[6]])
    C1 = _rand(rng, [dims[5], dims[0], dims[7], dims[8]])
    C2 = _rand(rng, [dims[5], dims[0], dims[7], dims[8]])
    D1 = _rand(rng, [dims[2], dims[8], dims[3], dims[6]])
    D2 = _rand(rng, [dims[2], dims[8], dims[3], dims[6]], sparse_div=27)
    E1 = _rand(rng, [dims[7], dims[9]])

    res = Tensor()
    res(ii[4] ** spans[4], ii[9] ** spans[9]) << (
        (arg(A1, 0, 1, 2, 3) + arg(A2, 0, 1, 2, 3))
        * arg(B1, 1, 4, 5, 6) * arg(C1, 5, 0, 7, 8)
        * arg(D1, 2, 8, 3, 6) * arg(E1, 7, 9)
        + (arg(A3, 0, 1, 2, 3) - arg(A2, 0, 1, 2, 3))
        * arg(B1, 1, 4, 5, 6) * arg(C1, 5, 0, 7, 8)
        * arg(D1, 2, 8, 3, 6) * arg(E1, 7, 9)
        - (arg(A1, 0, 1, 2, 3) + arg(A3, 0, 1, 2, 3))
        * arg(B1, 1, 4, 5, 6) * arg(C1, 5, 0, 7, 8)
        * arg(D1, 2, 8, 3, 6) * arg(E1, 7, 9)
    )
    assert res.frob_norm() <= 1e-10, f"identity 1: {res.frob_norm()}"

    res2 = Tensor()
    res2(ii[4] ** spans[4], ii[9] ** spans[9]) << (
        arg(A1, 0, 1, 2, 3) * arg(B1, 1, 4, 5, 6)
        * (arg(C1, 5, 0, 7, 8) + arg(C2, 5, 0, 7, 8))
        * (arg(D1, 2, 8, 3, 6) + arg(D2, 2, 8, 3, 6))
        * arg(E1, 7, 9)
        + arg(A1, 0, 1, 2, 3) * arg(B1, 1, 4, 5, 6)
        * (arg(C1, 5, 0, 7, 8) - arg(C2, 5, 0, 7, 8))
        * (arg(D1, 2, 8, 3, 6) - arg(D2, 2, 8, 3, 6))
        * arg(E1, 7, 9)
        - 2.0 * arg(A1, 0, 1, 2, 3) * arg(B1, 1, 4, 5, 6)
        * arg(C1, 5, 0, 7, 8) * arg(D1, 2, 8, 3, 6) * arg(E1, 7, 9)
        - 2.0 * arg(A1, 0, 1, 2, 3) * arg(B1, 1, 4, 5, 6)
        * arg(C2, 5, 0, 7, 8) * arg(D2, 2, 8, 3, 6) * arg(E1, 7, 9)
    )
    assert res2.frob_norm() <= 1e-10, f"identity 2: {res2.frob_norm()}"


def test_arithmetic_negatives():
    """Dimension-mismatch FAILTESTs (fullTensor_arithmetic.cxx:25-44):
    traces over unequal mode pairs and additions of mismatched shapes
    must raise through the expression frontend."""
    B = Tensor.random([2, 2])
    B2 = Tensor.random([3, 3])
    B3 = Tensor.random([3, 2])
    B4 = Tensor.random([2, 3])
    B5 = Tensor.random([2, 2, 2])
    i, j = xe.indices(2)

    for rhs in (
        lambda: B(i, j) * B2(j, j),
        lambda: B(i, j) * B3(j, j),
        lambda: B(i, j) * B4(j, j),
        lambda: B(i, j) * B5(j, j, j),
    ):
        C = Tensor()
        with pytest.raises(Exception):
            C(i) << rhs()

    for rhs in (
        lambda: B(i, j) + B2(j, j),
        lambda: B(i, j) + B3(j, j),
        lambda: B(i, j) + B4(j, j),
        lambda: B(i, j) + B5(j, j, j),
    ):
        out = Tensor()
        with pytest.raises(Exception):
            out(i, j) << rhs()
