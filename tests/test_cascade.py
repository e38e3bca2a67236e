"""Signal-cascade example tests (reference
doc/jekyll/_posts/1000-10-10-cascade.md; SLIM operator of P. Gelss et
al. 2017, Example 4.1).  The SLIM MPO is checked against an
independently-built dense generator, and a reduced implicit-Euler run
must produce normalized states with rising saturation curves."""

import pytest
import numpy as np

import xerus_tpu as xe
from xerus_tpu.examples import cascade


def _dense_generator(num_proteins, n):
    """Independent dense construction: A = sum_i (single-site S terms)
    + sum_i L_i (x) M_{i+1}, with S* = 0.7*M + S on the first site."""
    M = cascade.create_M(n).to_ndarray()
    S = cascade.create_S(n).to_ndarray()
    L = cascade.create_L(n).to_ndarray()
    Sstar = 0.7 * M + S
    I = np.eye(n)

    def site_term(mats):
        out = np.array([[1.0]])
        for m in mats:
            out = np.kron(out, m)
        return out

    A = np.zeros((n ** num_proteins,) * 2)
    for i in range(num_proteins):
        mats = [I] * num_proteins
        mats[i] = Sstar if i == 0 else S
        A += site_term(mats)
    for i in range(num_proteins - 1):
        mats = [I] * num_proteins
        mats[i] = L
        mats[i + 1] = M
        A += site_term(mats)
    return A


def test_cascade_operator_matches_dense_generator():
    num_proteins, n = 3, 4
    A_tt = cascade.cascade_operator(num_proteins, n)
    assert A_tt.ranks() == [3] * (num_proteins - 1)
    dense = A_tt.to_tensor().to_ndarray().reshape(n ** num_proteins,
                                                  n ** num_proteins)
    ref = _dense_generator(num_proteins, n)
    assert np.allclose(dense, ref, atol=1e-12)


def test_cascade_operator_two_sites():
    # degree-2 edge case: no middle component
    A_tt = cascade.cascade_operator(2, 3)
    dense = A_tt.to_tensor().to_ndarray().reshape(9, 9)
    assert np.allclose(dense, _dense_generator(2, 3), atol=1e-12)


@pytest.mark.slow
def test_cascade_implicit_euler_vs_dense_evolution():
    """The full TT pipeline (SLIM operator, ALS_SPD implicit-Euler steps,
    one-norm renormalization) against the same evolution done dense in
    numpy.  The generator is NON-symmetric: this exercises the ALS fast
    path's LU local-solve dispatch (reference
    blasLapackWrapper.cpp:542-585 runtime symmetry fallback — with
    Cholesky local solves this diverges to O(1) errors)."""
    num_proteins, n, steps, tau = 4, 8, 6, 1.0
    A = cascade.cascade_operator(num_proteins, n)
    assert not A.is_symmetric()

    # dense reference evolution
    N = n ** num_proteins
    dense_op = np.eye(N) - tau * _dense_generator(num_proteins, n)
    state = np.zeros(N)
    state[0] = 1.0
    dense_states = [state]
    for _ in range(steps):
        state = np.linalg.solve(dense_op, state)
        state = state / state.sum()
        dense_states.append(state)

    start = xe.TTTensor.dirac([n] * num_proteins, 0)
    start.use_dense_representations()
    start += 1e-14 * xe.TTTensor.random(
        list(start.dimensions), [5] * (start.degree() - 1))

    residuals = []
    results = cascade.implicit_euler(A, start, tau, steps,
                                     residuals=residuals)

    assert len(results) == steps + 1
    # every post-step state is a normalized probability vector
    for res in results[1:]:
        assert abs(cascade.one_norm(res) - 1.0) < 1e-8
    # the ALS solve really solved each implicit-Euler system
    assert max(residuals) < 1e-2

    # states track the dense evolution at the rank-6 truncation level
    for t in (1, steps):
        tt = results[t].to_tensor().to_ndarray().reshape(-1)
        rel = (np.linalg.norm(tt - dense_states[t])
               / np.linalg.norm(dense_states[t]))
        assert rel < 1e-3, f"step {t}: {rel}"

    conc = cascade.mean_concentration_table(results)
    w = np.arange(n, dtype=float)
    dense_conc = np.array(
        [[(s.reshape([n] * num_proteins).sum(
            axis=tuple(a for a in range(num_proteins) if a != p)) * w).sum()
          for p in range(num_proteins)] for s in dense_states])
    assert np.abs(conc - dense_conc).max() < 1e-2
    # saturation curves: everything starts at zero copies, protein 1
    # grows, downstream proteins lag their upstream neighbor
    assert np.allclose(conc[0], 0.0, atol=1e-8)
    assert conc[-1][0] > conc[1][0] > 1e-3
    for p in range(1, num_proteins):
        assert conc[-1][p - 1] > conc[-1][p] >= -1e-8


def test_run_cascade_smoke():
    results = cascade.run_cascade(num_proteins=3, num_steps=2,
                                  max_num_per_site=6, rank_x=3)
    assert len(results) == 3
    table = cascade.mean_concentration_table(results)
    assert table.shape == (3, 3)
    assert np.all(np.isfinite(table))
