"""Native (C++) contraction-path optimizer tests."""

import numpy as np
import pytest

import xerus_tpu as xe
from xerus_tpu import Tensor, TensorNetwork
from xerus_tpu.network.native import native_available, native_best_order
from xerus_tpu.network.heuristics import _Graph, _greedy, _SCORERS


pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native pathopt not built")


def _random_network(num_nodes=6, dim=4):
    """Chain + a few cross links."""
    idx = xe.indices(num_nodes + 1 + num_nodes)
    mats = [Tensor.random([dim, dim]) for _ in range(num_nodes)]
    expr = mats[0](idx[0], idx[1])
    for p in range(1, num_nodes):
        expr = expr * mats[p](idx[p], idx[p + 1])
    net = TensorNetwork()
    net(idx[0], idx[num_nodes]) << expr
    return net


def _order_cost(network, ids, order):
    g = _Graph(network, set(ids))
    total = 0.0
    for a, b in order:
        total += g.merge(a, b)
    return total


def test_native_matches_or_beats_python():
    net = _random_network(7)
    ids = {i for i, n in enumerate(net.nodes) if not n.erased}
    native_order = native_best_order(net, ids)
    assert native_order is not None
    native_cost = _order_cost(net, ids, native_order)
    best_py = np.inf
    for scorer in _SCORERS:
        cost, _ = _greedy(_Graph(net, ids), scorer)
        best_py = min(best_py, cost)
    assert native_cost <= best_py * (1 + 1e-9)


def test_native_order_is_valid_contraction():
    net = _random_network(6)
    ids = {i for i, n in enumerate(net.nodes) if not n.erased}
    order = native_best_order(net, ids)
    seen_dead = set()
    for a, b in order:
        assert a not in seen_dead and b not in seen_dead
        seen_dead.add(b)
    assert len(order) == len(ids) - 1


def test_network_contraction_via_native_correct():
    dim = 3
    idx = xe.indices(10)
    # star network: center connected to 4 leaves
    center = Tensor.random([dim] * 4)
    leaves = [Tensor.random([dim, 2]) for _ in range(4)]
    net = TensorNetwork()
    expr = center(idx[0], idx[1], idx[2], idx[3])
    for p in range(4):
        expr = expr * leaves[p](idx[p], idx[4 + p])
    net(idx[4], idx[5], idx[6], idx[7]) << expr
    ref = np.einsum('abcd,ae,bf,cg,dh->efgh', center.to_ndarray(),
                    *[l.to_ndarray() for l in leaves])
    assert np.allclose(net.to_tensor().to_ndarray(), ref, atol=1e-12)


def test_refinement_not_worse_and_near_optimal_small():
    """The sequence-refinement pass (pathopt.cpp refine_pass; intent of the
    reference's exchange heuristic, contractionHeuristic.cpp:278-370) must
    never worsen the portfolio result; on small random networks the result
    must match brute-force optimum or stay within 2x."""
    from itertools import permutations

    def brute_force(g0, ids):
        import copy
        best = [float("inf")]

        def rec(g, alive, cost):
            if cost >= best[0]:
                return
            if len(alive) == 1:
                best[0] = min(best[0], cost)
                return
            al = sorted(alive)
            for i in range(len(al)):
                for j in range(i + 1, len(al)):
                    g2 = copy.deepcopy(g)
                    c = g2.merge(al[i], al[j])
                    rec(g2, alive - {al[j]}, cost + c)

        rec(g0, set(ids), 0.0)
        return best[0]

    rng = np.random.default_rng(11)
    for trial in range(4):
        num = 6
        dims = rng.integers(2, 5, size=num + 1)
        idx = xe.indices(num + 1)
        mats = [Tensor.random([int(dims[p]), int(dims[p + 1])])
                for p in range(num)]
        expr = mats[0](idx[0], idx[1])
        for p in range(1, num):
            expr = expr * mats[p](idx[p], idx[p + 1])
        net = TensorNetwork()
        net(idx[0], idx[num]) << expr
        ids = {i for i, n in enumerate(net.nodes) if not n.erased}
        order = native_best_order(net, ids)
        got = _order_cost(net, ids, order)
        opt = brute_force(_Graph(net, set(ids)), ids)
        assert got <= 2 * opt + 1e-9, (got, opt)
