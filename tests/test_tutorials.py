"""Doc-example tests (intent of tutorials.cxx and strassen.cxx), plus a
runner that executes every ```python block in doc/tutorials/*.md — the
tutorial pages are living documentation (reference doc/jekyll/_posts/)."""

import os
import re

import numpy as np
import pytest

import xerus_tpu as xe
from xerus_tpu import Tensor, TTTensor, TTOperator

_TUTORIAL_DIR = os.path.join(os.path.dirname(__file__), "..", "doc",
                             "tutorials")


# long-horizon solver pages (each compiles + converges whole solves;
# 20-35 s apiece on the 1-CPU host) run in the slow tier — the default
# tier keeps every other page, including quickstart
_HEAVY_PAGES = {"als.md", "riemannian.md", "completion.md"}


def _tutorial_pages():
    if not os.path.isdir(_TUTORIAL_DIR):
        return []
    names = sorted(f for f in os.listdir(_TUTORIAL_DIR)
                   if f.endswith(".md"))
    return [pytest.param(f, marks=pytest.mark.slow) if f in _HEAVY_PAGES
            else f for f in names]


@pytest.mark.parametrize("page", _tutorial_pages())
def test_tutorial_page_snippets(page):
    """All ```python blocks of one tutorial page run top-to-bottom in a
    shared namespace (each page is a self-contained script)."""
    text = open(os.path.join(_TUTORIAL_DIR, page)).read()
    blocks = re.findall(r"```python\n(.*?)```", text, flags=re.S)
    if not blocks:
        pytest.skip("no python snippets")
    ns = {}
    for n, block in enumerate(blocks):
        try:
            exec(compile(block, f"{page}[block {n}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - diagnostic clarity
            raise AssertionError(
                f"{page} block {n} failed: {type(e).__name__}: {e}\n"
                f"--- snippet ---\n{block}") from e


def _dense_laplace(n):
    A = Tensor([n, n], xe.Representation.Sparse)
    for i in range(n):
        A[[i, i]] = 2.0
        if i + 1 < n:
            A[[i + 1, i]] = -1.0
            A[[i, i + 1]] = -1.0
    return A


def test_quickstart_qtt_poisson():
    """The quickstart flow (doc/jekyll/_posts/1000-12-10-quickstart.md;
    tested in tutorials.cxx:20-43) at 256 = 2^8 grid points."""
    n = 256
    q = 8
    A = _dense_laplace(n)
    A *= float(n * n)
    A.use_dense_representation()
    A.reinterpret_dimensions([2] * (2 * q))
    # reorder (row-bits, col-bits) -> operator layout expects (out.., in..):
    # after reinterpret, modes alternate? No: row-major (row, col) split into
    # bits gives modes (r1..rq, c1..cq) which IS the (out.., in..) layout.
    ttA = TTOperator(A, eps=1e-14)
    assert max(ttA.ranks()) <= 4  # QTT Laplace has low exact rank

    b = Tensor.ones([2] * q)
    ttb = TTTensor(b)
    ttx = TTTensor.random([2] * q, 3)
    xe.ALS_SPD(ttA, ttx, ttb, 1e-12)

    A_mat = A.to_ndarray().reshape(n, n)
    x_ref = np.linalg.solve(A_mat, np.ones(n))
    x_got = ttx.to_tensor().to_ndarray().reshape(n)
    assert np.linalg.norm(x_got - x_ref) / np.linalg.norm(x_ref) < 1e-8


def test_strassen_matmul_tensor():
    """strassen.cxx TTRanks: the matmul tensor T[i,j,j,k,i,k]=1 reproduces
    A@B, and its TT rounding has bounded ranks."""
    for n in (2, 3):
        T = Tensor([n] * 6, xe.Representation.Sparse)
        for i in range(n):
            for j in range(n):
                for k in range(n):
                    T[[i, j, j, k, i, k]] = 1.0
        A = Tensor.random([n, n])
        B = Tensor.random([n, n])
        i1, i2, i3, i4, i5, i6 = xe.indices(6)
        C1 = Tensor(); C2 = Tensor()
        C1(i1, i3) << A(i1, i2) * B(i2, i3)
        C2(i5, i6) << T(i1, i2, i3, i4, i5, i6) * A(i1, i2) * B(i3, i4)
        assert xe.approx_equal(C1, C2, 1e-12)

        ttT = TTTensor(T.dense_copy())
        ttT.round(1e-12)
        # the TT-rank of the matmul tensor is bounded by n^2
        assert max(ttT.ranks()) <= n * n


def test_models_package():
    from xerus_tpu import models
    A, b, x0 = models.poisson_problem(6)
    assert A.num_components() == 6 and b.dimensions == x0.dimensions
    H, g0 = models.heisenberg_groundstate_problem(5)
    assert H.ranks() == [5] * 4
    truth, ms, x1 = models.completion_problem([4, 4, 4], 2, 30)
    assert ms.size() == 30
    assert ms.test(truth) < 1e-12
