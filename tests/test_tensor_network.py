"""TensorNetwork tests (intent of tensorNetwork.cxx and
tensorNetwork_element_access.cxx)."""

import numpy as np
import pytest

import xerus_tpu as xe
from xerus_tpu import Tensor, TensorNetwork


def _net_from_product(*shapes_and_spec):
    pass


def test_network_from_tensor():
    t = Tensor.random([3, 4])
    net = TensorNetwork(t)
    net.require_valid_network()
    assert net.degree() == 2
    assert net.dimensions == [3, 4]
    assert np.allclose(net.to_tensor().to_ndarray(), t.to_ndarray())


def test_lazy_product_assignment():
    A = Tensor.random([3, 4]); B = Tensor.random([4, 5])
    i, j, k = xe.indices(3)
    net = TensorNetwork()
    net(i, k) << A(i, j) * B(j, k)
    net.require_valid_network()
    assert len([n for n in net.nodes if not n.erased]) == 2  # still lazy
    assert np.allclose(net.to_tensor().to_ndarray(), A.to_ndarray() @ B.to_ndarray(),
                       atol=1e-12)


def test_network_entry_access():
    A = Tensor.random([3, 4]); B = Tensor.random([4, 5])
    i, j, k = xe.indices(3)
    net = TensorNetwork()
    net(i, k) << A(i, j) * B(j, k)
    ref = A.to_ndarray() @ B.to_ndarray()
    assert np.isclose(net[[1, 2]], ref[1, 2])
    assert np.isclose(net[7], ref.reshape(-1)[7])


def test_network_in_expression():
    A = Tensor.random([3, 4]); B = Tensor.random([4, 5]); C = Tensor.random([5, 2])
    i, j, k, l = xe.indices(4)
    net = TensorNetwork()
    net(i, k) << A(i, j) * B(j, k)
    out = Tensor()
    out(i, l) << net(i, k) * C(k, l)
    assert np.allclose(out.to_ndarray(), A.to_ndarray() @ B.to_ndarray() @ C.to_ndarray(),
                       atol=1e-12)


def test_network_times_network():
    A = Tensor.random([3, 4]); B = Tensor.random([4, 5])
    C = Tensor.random([5, 6]); D = Tensor.random([6, 3])
    i, j, k, l, m = xe.indices(5)
    n1 = TensorNetwork(); n1(i, k) << A(i, j) * B(j, k)
    n2 = TensorNetwork(); n2(k, m) << C(k, l) * D(l, m)
    big = TensorNetwork()
    big(i, m) << n1(i, k) * n2(k, m)
    big.require_valid_network()
    assert len([n for n in big.nodes if not n.erased]) == 4
    ref = A.to_ndarray() @ B.to_ndarray() @ C.to_ndarray() @ D.to_ndarray()
    assert np.allclose(big.to_tensor().to_ndarray(), ref, atol=1e-12)


def test_network_trace_closed():
    A = Tensor.random([4, 4])
    i, j = xe.indices(2)
    val = float(A(i, j) * Tensor.identity([4, 4])(i, j))
    assert np.isclose(val, np.trace(A.to_ndarray()))


def test_network_ring_contraction():
    # ring of 4 matrices: trace(ABCD)
    mats = [Tensor.random([5, 5]) for _ in range(4)]
    i, j, k, l = xe.indices(4)
    val = float(mats[0](i, j) * mats[1](j, k) * mats[2](k, l) * mats[3](l, i))
    ref = np.trace(mats[0].to_ndarray() @ mats[1].to_ndarray()
                   @ mats[2].to_ndarray() @ mats[3].to_ndarray())
    assert np.isclose(val, ref)


def test_network_fix_mode():
    A = Tensor.random([3, 4]); B = Tensor.random([4, 5])
    i, j, k = xe.indices(3)
    net = TensorNetwork()
    net(i, k) << A(i, j) * B(j, k)
    net.fix_mode(0, 1)
    net.require_valid_network()
    assert net.dimensions == [5]
    ref = (A.to_ndarray() @ B.to_ndarray())[1, :]
    assert np.allclose(net.to_tensor().to_ndarray(), ref, atol=1e-12)


def test_network_scalar_scaling():
    A = Tensor.random([3, 3])
    net = TensorNetwork(A)
    net *= 2.5
    assert np.allclose(net.to_tensor().to_ndarray(), 2.5 * A.to_ndarray())
    net /= 2.5
    assert np.allclose(net.to_tensor().to_ndarray(), A.to_ndarray())


def test_transfer_core():
    A = Tensor.random([3, 4]); B = Tensor.random([4, 5])
    i, j, k = xe.indices(3)
    net = TensorNetwork()
    net(i, k) << A(i, j) * B(j, k)
    before = net.to_tensor().to_ndarray()
    net.transfer_core(0, 1)
    net.require_valid_network()
    after = net.to_tensor().to_ndarray()
    assert np.allclose(before, after, atol=1e-12)
    # node 0 must now have orthonormal columns
    q = net.nodes[0].tensor.to_ndarray().reshape(3, -1)
    assert np.allclose(q.T @ q, np.eye(q.shape[1]), atol=1e-12)


def test_round_edge():
    # two nodes sharing a rank-8 edge carrying only rank-2 content
    base = xe.misc.randomEngine.normal(size=(6, 2)) @ xe.misc.randomEngine.normal(size=(2, 7))
    U, S, Vt = np.linalg.svd(base)
    A = Tensor.from_ndarray(U[:, :6])          # 6 x 6
    B = Tensor.from_ndarray(np.diag(np.concatenate([S[:2], np.zeros(4)])) @ np.eye(6, 7))  # 6 x 7
    i, j, k = xe.indices(3)
    net = TensorNetwork()
    net(i, k) << A(i, j) * B(j, k)
    before = net.to_tensor().to_ndarray()
    net.round_edge(0, 1, max_rank=2, eps=0.0)
    net.require_valid_network()
    pos, _ = net.find_common_edge(0, 1)
    assert net.nodes[0].neighbors[pos].dimension == 2
    assert np.allclose(net.to_tensor().to_ndarray(), before, atol=1e-10)


def test_contraction_cost():
    A = Tensor.random([10, 20]); B = Tensor.random([20, 30])
    i, j, k = xe.indices(3)
    net = TensorNetwork()
    net(i, k) << A(i, j) * B(j, k)
    assert net.contraction_cost(0, 1) == 10 * 20 * 30


def test_draw_produces_dot():
    A = Tensor.random([3, 4]); B = Tensor.random([4, 5])
    i, j, k = xe.indices(3)
    net = TensorNetwork()
    net(i, k) << A(i, j) * B(j, k)
    dot = net.draw()
    assert dot.startswith("graph network {") and "n0 -- n1" in dot


def test_large_network_heuristic_path():
    # chain of 6 tensors — greedy portfolio must find a near-linear path
    dims = [2, 3, 4, 5, 4, 3, 2]
    mats = [Tensor.random([dims[p], dims[p + 1]]) for p in range(6)]
    idx = xe.indices(7)
    net = TensorNetwork()
    expr = mats[0](idx[0], idx[1])
    for p in range(1, 6):
        expr = expr * mats[p](idx[p], idx[p + 1])
    net(idx[0], idx[6]) << expr
    ref = mats[0].to_ndarray()
    for p in range(1, 6):
        ref = ref @ mats[p].to_ndarray()
    assert np.allclose(net.to_tensor().to_ndarray(), ref, atol=1e-12)


def test_sum_falls_back_to_dense_node():
    A = Tensor.random([3, 4]); B = Tensor.random([3, 4])
    i, j = xe.indices(2)
    net = TensorNetwork()
    net(i, j) << A(i, j) + B(i, j)
    assert len([n for n in net.nodes if not n.erased]) == 1
    assert np.allclose(net.to_tensor().to_ndarray(), A.to_ndarray() + B.to_ndarray())


def test_tt_to_network_cast_preserves_graph():
    """TensorNetwork(tt) / tt.copy_as_network() mirror the TT chain as a
    node graph (reference: TTNetwork IS-A TensorNetwork, ttNetwork.h:44) —
    one node per component, bond links, physical modes external."""
    tt = xe.TTTensor.random([3] * 4, 2)
    tn = xe.TensorNetwork(tt)
    assert len(tn.nodes) == 4 and tn.degree() == 4
    tn.require_valid_network()
    assert np.allclose(tn.to_tensor().to_ndarray(), tt.to_tensor().to_ndarray())
    assert tn.contraction_cost(0, 1) > 0
    # graph ops work on the cast result
    tn.fix_mode(0, 1)
    tn.sanitize()
    tn.require_valid_network()
    assert tn.degree() == 3

    op = xe.TTOperator.random([3, 4, 3, 4], 2)
    tno = op.copy_as_network()
    assert len(tno.nodes) == 2 and tno.dimensions == [3, 4, 3, 4]
    assert np.allclose(tno.to_tensor().to_ndarray(), op.to_tensor().to_ndarray())

    # copy ctor from another network deep-copies
    tn2 = xe.TensorNetwork(tno)
    tn2.nodes[0].tensor *= 2.0
    assert abs(tno.to_tensor().frob_norm() * 2
               - tn2.to_tensor().frob_norm()) < 1e-10 * tno.frob_norm()
