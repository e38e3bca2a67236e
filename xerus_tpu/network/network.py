"""Generic tensor-network graph with lazy contraction.

Re-design of ``xerus::TensorNetwork`` (include/xerus/tensorNetwork.h:42-520,
src/xerus/tensorNetwork.cpp).  The graph bookkeeping (nodes, links, traces,
external legs) is host-side Python; every actual contraction dispatches to
core.contract (XLA dot_general / sparse kernels).  Full-network contraction
uses a portfolio of greedy path heuristics whose result is CACHED per network
topology — the reference re-runs the search at every evaluation
(tensorNetwork.cpp:1321-1327), which we deliberately do not.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from ..config import config, require
from ..core.tensor import Tensor, Representation, reshuffle as core_reshuffle, _prod
from ..core.contract import contract as core_contract
from ..core import factorizations as fact


class Link:
    """One leg of a node: either to another node or to the outside
    (tensorNetwork.h:50-79)."""

    __slots__ = ("other", "index_position", "dimension", "external")

    def __init__(self, other: int, index_position: int, dimension: int,
                 external: bool):
        self.other = other
        self.index_position = index_position
        self.dimension = dimension
        self.external = external

    def links(self, node_id: int) -> bool:
        return (not self.external) and self.other == node_id

    @property
    def indexPosition(self) -> int:
        """Reference binding name (python/tensorNetwork.cpp:118)."""
        return self.index_position

    def __repr__(self) -> str:
        kind = "ext" if self.external else "node"
        return f"Link({kind} {self.other}@{self.index_position}, dim={self.dimension})"


class TensorNode:
    """A node: tensor + neighbor list (tensorNetwork.h:83-120)."""

    __slots__ = ("tensor", "neighbors", "erased")

    def __init__(self, tensor: Optional[Tensor], neighbors: Optional[List[Link]] = None):
        self.tensor = tensor
        self.neighbors: List[Link] = neighbors if neighbors is not None else []
        self.erased = tensor is None

    def degree(self) -> int:
        return len(self.neighbors)

    def size(self) -> int:
        return _prod(l.dimension for l in self.neighbors)

    def erase(self) -> None:
        self.tensor = None
        self.neighbors = []
        self.erased = True

    @property
    def tensorObject(self) -> Optional[Tensor]:
        """Reference binding name (python/tensorNetwork.cpp:103): the
        node's tensor, or None for an erased node."""
        return self.tensor


class TensorNetwork:
    """Node/edge graph representing an uncontracted tensor expression."""

    def __init__(self, tensor: Optional[Tensor] = None, zero_node: bool = True):
        self.dimensions: List[int] = []
        self.nodes: List[TensorNode] = []
        self.external_links: List[Link] = []
        if isinstance(tensor, TensorNetwork):
            TensorNetwork._copy_into(tensor, self)  # copy ctor
        elif tensor is not None and hasattr(tensor, "copy_as_network") \
                and not isinstance(tensor, Tensor):
            # TT/network cast (reference TTNetwork IS-A TensorNetwork):
            # the node graph mirrors the TT chain
            TensorNetwork._copy_into(tensor.copy_as_network(), self)
        elif tensor is not None:
            self.dimensions = list(tensor.dimensions)
            links = [Link(i, i, d, True) for i, d in enumerate(self.dimensions)]
            self.external_links = [Link(0, i, d, False) for i, d in enumerate(self.dimensions)]
            self.nodes = [TensorNode(tensor.copy(), links)]
        elif zero_node:
            # degree-0 zero network (tensorNetwork.h ZeroNode::Add semantics)
            self.nodes = [TensorNode(Tensor([], Representation.Sparse))]

    # ------------------------------------------------------------------
    # Information
    # ------------------------------------------------------------------
    def degree(self) -> int:
        return len(self.dimensions)

    def order(self) -> int:
        return len(self.dimensions)

    def datasize(self) -> int:
        return sum(n.tensor.size for n in self.nodes if not n.erased)

    def node(self, i: int) -> TensorNode:
        """Node accessor (python/tensorNetwork.cpp:44-46)."""
        return self.nodes[i]

    def copy(self) -> "TensorNetwork":
        out = type(self).__new__(type(self))
        TensorNetwork._copy_into(self, out)
        return out

    def _copy_into(self, out: "TensorNetwork") -> None:
        out.dimensions = list(self.dimensions)
        out.external_links = [Link(l.other, l.index_position, l.dimension, l.external)
                              for l in self.external_links]
        out.nodes = []
        for n in self.nodes:
            if n.erased:
                out.nodes.append(TensorNode(None))
            else:
                out.nodes.append(TensorNode(
                    n.tensor.copy(),
                    [Link(l.other, l.index_position, l.dimension, l.external)
                     for l in n.neighbors]))

    # ------------------------------------------------------------------
    # Validation (tensorNetwork.cpp:395)
    # ------------------------------------------------------------------
    def require_valid_network(self, check_erased: bool = True) -> None:
        if not config.runtime_checks:
            return
        require(len(self.external_links) == len(self.dimensions),
                "externalLinks / dimensions mismatch")
        for i, (el, d) in enumerate(zip(self.external_links, self.dimensions)):
            require(el.dimension == d, f"external link {i} dimension mismatch")
            node = self.nodes[el.other]
            require(not node.erased, f"external link {i} points to erased node")
            link = node.neighbors[el.index_position]
            require(link.external and link.other == i,
                    f"external link {i} back-reference broken")
            require(link.dimension == d, f"external link {i} node dim mismatch")
        for nid, node in enumerate(self.nodes):
            if node.erased:
                require(not check_erased, f"node {nid} erased")
                continue
            require(node.tensor.degree() == node.degree(),
                    f"node {nid}: tensor degree {node.tensor.degree()} != links {node.degree()}")
            for pos, link in enumerate(node.neighbors):
                require(link.dimension == node.tensor.dimensions[pos],
                        f"node {nid} leg {pos} dimension mismatch")
                if link.external:
                    require(self.external_links[link.other].other == nid,
                            f"node {nid} external leg {pos} broken")
                else:
                    other = self.nodes[link.other]
                    require(not other.erased, f"node {nid} links erased node {link.other}")
                    back = other.neighbors[link.index_position]
                    require(back.links(nid) and back.index_position == pos,
                            f"node {nid}<->{link.other} back-reference broken")

    def require_correct_format(self) -> None:
        self.require_valid_network()

    # ------------------------------------------------------------------
    # Scalar ops (tensorNetwork.h:288-296)
    # ------------------------------------------------------------------
    def __imul__(self, factor: float) -> "TensorNetwork":
        for n in self.nodes:
            if not n.erased:
                n.tensor.factor *= float(factor)
                return self
        raise ValueError("cannot scale a network without nodes")

    def __itruediv__(self, divisor: float) -> "TensorNetwork":
        self *= 1.0 / float(divisor)
        return self

    # ------------------------------------------------------------------
    # Entry access (tensorNetwork.cpp:268-287)
    # ------------------------------------------------------------------
    def __getitem__(self, key) -> float:
        if isinstance(key, (list, tuple, np.ndarray)):
            positions = [int(k) for k in key]
        else:
            positions = list(Tensor.position_to_multiIndex(int(key), self.dimensions))
        net = self.copy_as_network()
        for mode in reversed(range(len(positions))):
            net.fix_mode(mode, positions[mode])
        t = net.to_tensor()
        return float(t[0]) if t.degree() == 0 else float(t[[0] * t.degree()])

    def copy_as_network(self) -> "TensorNetwork":
        """Copy as a plain TensorNetwork (drops subclass invariants)."""
        out = TensorNetwork.__new__(TensorNetwork)
        TensorNetwork._copy_into(self, out)
        return out

    # ------------------------------------------------------------------
    # Conversion to Tensor (full contraction)
    # ------------------------------------------------------------------
    def to_tensor(self) -> Tensor:
        net = self.copy_as_network()
        net.contract_unconnected_subnetworks()
        alive = {i for i, n in enumerate(net.nodes) if not n.erased}
        if not alive:
            return Tensor(net.dimensions, Representation.Sparse)
        res_id = net.contract_ids(alive)
        node = net.nodes[res_id]
        # reshuffle node modes into external order
        perm = [0] * node.degree()
        for pos, link in enumerate(node.neighbors):
            require(link.external, "to_tensor: node still has internal links")
            perm[pos] = link.other
        t = node.tensor
        if perm != list(range(node.degree())):
            t = core_reshuffle(t, perm)
        return t

    def frob_norm(self) -> float:
        return self.to_tensor().frob_norm()

    # ------------------------------------------------------------------
    # Indexing hook
    # ------------------------------------------------------------------
    def __call__(self, *indices):
        from ..indexing.expressions import IndexedTensor
        return IndexedTensor(self, list(indices))

    # DSL integration: expand into einsum operands -----------------------
    def einsum_operands(self, outer_labels: Sequence) -> List[Tuple[Tensor, List]]:
        """Yield (Tensor, labels) per node; external leg k carries
        outer_labels[k], internal edges get fresh shared labels."""
        edge_label: Dict[Tuple[int, int, int, int], Tuple] = {}
        out = []
        for nid, node in enumerate(self.nodes):
            if node.erased:
                continue
            labels = []
            for pos, link in enumerate(node.neighbors):
                if link.external:
                    labels.append(outer_labels[link.other])
                else:
                    key = (min(nid, link.other), max(nid, link.other),
                           min(pos, link.index_position) if nid == link.other else
                           (pos if nid < link.other else link.index_position),
                           (max(pos, link.index_position) if nid == link.other else 0))
                    if key not in edge_label:
                        edge_label[key] = ("edge", id(self), len(edge_label))
                    labels.append(edge_label[key])
            out.append((node.tensor, labels))
        return out

    # ------------------------------------------------------------------
    # Graph surgery helpers
    # ------------------------------------------------------------------
    def swap_external_links(self, i: int, j: int) -> None:
        li, lj = self.external_links[i], self.external_links[j]
        self.nodes[li.other].neighbors[li.index_position].other = j
        self.nodes[lj.other].neighbors[lj.index_position].other = i
        self.external_links[i], self.external_links[j] = lj, li
        self.dimensions[i], self.dimensions[j] = self.dimensions[j], self.dimensions[i]

    def fix_mode(self, mode: int, slate: int) -> None:
        """Fix external mode to a value (tensorNetwork.cpp fix_mode)."""
        require(0 <= mode < self.degree(), "fix_mode: invalid mode")
        el = self.external_links[mode]
        node = self.nodes[el.other]
        node.tensor.fix_mode(el.index_position, slate)
        del node.neighbors[el.index_position]
        # update references to shifted leg positions of this node
        for pos, link in enumerate(node.neighbors):
            if link.external:
                self.external_links[link.other].index_position = pos
            else:
                self.nodes[link.other].neighbors[link.index_position].index_position = pos
        del self.external_links[mode]
        del self.dimensions[mode]
        # renumber external link ids above `mode`
        for k in range(mode, len(self.external_links)):
            l = self.external_links[k]
            self.nodes[l.other].neighbors[l.index_position].other = k

    def remove_slate(self, mode: int, slate: int) -> None:
        el = self.external_links[mode]
        node = self.nodes[el.other]
        node.tensor.remove_slate(el.index_position, slate)
        new_dim = node.tensor.dimensions[el.index_position]
        node.neighbors[el.index_position].dimension = new_dim
        el.dimension = new_dim
        self.dimensions[mode] = new_dim

    def resize_mode(self, mode: int, new_dim: int, cut_pos: Optional[int] = None) -> None:
        el = self.external_links[mode]
        node = self.nodes[el.other]
        node.tensor.resize_mode(el.index_position, new_dim, cut_pos)
        node.neighbors[el.index_position].dimension = new_dim
        el.dimension = new_dim
        self.dimensions[mode] = new_dim

    def reshuffle_nodes(self, f: Callable[[int], int]) -> None:
        """Renumber nodes by mapping old id -> f(old id)
        (tensorNetwork.cpp reshuffle_nodes)."""
        new_nodes: List[TensorNode] = [TensorNode(None)
                                       for _ in range(len(self.nodes))]
        max_id = 0
        for old_id, node in enumerate(self.nodes):
            if node.erased:
                continue
            nid = f(old_id)
            max_id = max(max_id, nid)
            new_nodes[nid] = node
        self.nodes = new_nodes[:max_id + 1]
        for el in self.external_links:
            el.other = f(el.other)
        for node in self.nodes:
            if node.erased:
                continue
            for link in node.neighbors:
                if not link.external:
                    link.other = f(link.other)

    def sanitize(self) -> None:
        """Remove erased nodes, compacting ids (tensorNetwork.cpp:240)."""
        id_map = {}
        cnt = 0
        for i, n in enumerate(self.nodes):
            if not n.erased:
                id_map[i] = cnt
                cnt += 1
        self.reshuffle_nodes(lambda i: id_map.get(i, i))

    def stripped_subnet(self, predicate=None) -> "TensorNetwork":
        """Copy containing only nodes passing ``predicate`` with all other
        links degraded to external (tensorNetwork.h:209)."""
        predicate = predicate or (lambda _nid: True)
        out = TensorNetwork.__new__(TensorNetwork)
        TensorNetwork._copy_into(self, out)
        ext_count = len(out.external_links)
        for nid, node in enumerate(out.nodes):
            if node.erased:
                continue
            if not predicate(nid):
                node.erase()
                continue
        for nid, node in enumerate(out.nodes):
            if node.erased:
                continue
            for pos, link in enumerate(node.neighbors):
                if not link.external and out.nodes[link.other].erased:
                    out.external_links.append(Link(nid, pos, link.dimension, False))
                    out.dimensions.append(link.dimension)
                    node.neighbors[pos] = Link(len(out.external_links) - 1,
                                               pos, link.dimension, True)
        return out

    # ------------------------------------------------------------------
    # Traces and pairwise contraction (the hot graph ops)
    # ------------------------------------------------------------------
    def perform_traces(self, node_id: int) -> None:
        """Contract self-loops of one node (tensorNetwork.cpp:222)."""
        node = self.nodes[node_id]
        while True:
            pair = None
            for pos, link in enumerate(node.neighbors):
                if link.links(node_id):
                    pair = (min(pos, link.index_position), max(pos, link.index_position))
                    break
            if pair is None:
                return
            a, b = pair
            node.tensor.perform_trace(a, b)
            del node.neighbors[b]
            del node.neighbors[a]
            for pos, link in enumerate(node.neighbors):
                if link.external:
                    self.external_links[link.other].index_position = pos
                elif link.links(node_id):
                    # internal self-link positions shift too
                    old = link.index_position
                    link.index_position = old - (old > b) - (old > a)
                else:
                    self.nodes[link.other].neighbors[link.index_position].index_position = pos

    def find_common_edge(self, a: int, b: int) -> Tuple[int, int]:
        for pos, link in enumerate(self.nodes[a].neighbors):
            if link.links(b):
                return pos, link.index_position
        raise ValueError(f"nodes {a} and {b} share no edge")

    def contraction_cost(self, a: int, b: int) -> float:
        """FLOP estimate m*n*r (contractionHeuristic.cpp:100-102)."""
        na, nb = self.nodes[a], self.nodes[b]
        if a == b:
            return float(na.size())  # trace cost
        r = 1.0
        for link in na.neighbors:
            if link.links(b):
                r *= link.dimension
        m = na.size() / r
        n = nb.size() / r
        return m * n * r

    def contract_pair(self, a: int, b: int) -> None:
        """Contract node b into node a (tensorNetwork.cpp:1037)."""
        require(a != b, "use perform_traces for self-contraction")
        na, nb = self.nodes[a], self.nodes[b]
        require(not na.erased and not nb.erased, "contracting erased node")

        shared_a = [pos for pos, l in enumerate(na.neighbors) if l.links(b)]
        shared_b = [na.neighbors[pos].index_position for pos in shared_a]
        open_a = [pos for pos, l in enumerate(na.neighbors) if not l.links(b)]
        open_b = [pos for pos in range(nb.degree()) if pos not in shared_b]

        ta, tb = na.tensor, nb.tensor
        # reshuffle a: open first, shared last; b: shared first (same order), open last
        perm_a_target = open_a + shared_a
        if perm_a_target != list(range(na.degree())):
            ta = core_reshuffle(ta, [perm_a_target.index(p) for p in range(na.degree())])
        perm_b_target = shared_b + open_b
        if perm_b_target != list(range(nb.degree())):
            tb = core_reshuffle(tb, [perm_b_target.index(p) for p in range(nb.degree())])
        result = core_contract(ta, tb, len(shared_a))

        new_neighbors: List[Link] = []
        for pos in open_a:
            new_neighbors.append(na.neighbors[pos])
        for pos in open_b:
            new_neighbors.append(nb.neighbors[pos])
        # update back references
        for new_pos, link in enumerate(new_neighbors):
            if link.external:
                el = self.external_links[link.other]
                el.other = a
                el.index_position = new_pos
            else:
                back = self.nodes[link.other].neighbors[link.index_position]
                back.other = a
                back.index_position = new_pos
        self.nodes[a] = TensorNode(result, new_neighbors)
        self.nodes[b].erase()
        # node may now have self-loops (a and b shared a third neighbor? no —
        # but a-a links arise when a and b both linked the same node? those
        # become links to `a`? no: links to third nodes keep their target).
        # Self-loops DO arise when a and b were doubly connected via
        # different modes? Those were all contracted. Remaining case: a had
        # a link to b AND b back to a at unshared positions — impossible.

    def contract_ids(self, ids: Set[int]) -> int:
        """Contract the given node set; returns surviving node id
        (tensorNetwork.cpp:1253-1333)."""
        ids = set(ids)
        for nid in ids:
            self.perform_traces(nid)
        if not ids:
            return -1
        if len(ids) == 1:
            return next(iter(ids))
        order = self._contraction_order(ids)
        for x, y in order:
            self.contract_pair(x, y)
        return order[-1][0]

    def contract(self, a, b: Optional[int] = None):
        """Reference-name overload (python/tensorNetwork.cpp:92-93):
        ``contract(id1, id2)`` contracts one node pair in place;
        ``contract(ids)`` contracts a node set and returns the surviving
        node id (tensorNetwork.cpp:1037 / :1253)."""
        if b is not None:
            return self.contract_pair(int(a), int(b))
        return self.contract_ids(set(a))

    @property
    def externalLinks(self) -> List[Link]:
        """Reference binding name (python/tensorNetwork.cpp:47)."""
        return self.external_links

    def _contraction_order(self, ids: Set[int]) -> List[Tuple[int, int]]:
        from .heuristics import best_contraction_order
        return best_contraction_order(self, ids)

    def contract_unconnected_subnetworks(self) -> None:
        """Contract all degree-0 subgraphs into a scalar factor applied to
        the remainder (tensorNetwork.cpp:215)."""
        # find connected components
        alive = [i for i, n in enumerate(self.nodes) if not n.erased]
        comp: Dict[int, int] = {}
        for start in alive:
            if start in comp:
                continue
            stack = [start]
            comp[start] = start
            while stack:
                cur = stack.pop()
                for link in self.nodes[cur].neighbors:
                    if not link.external and link.other not in comp:
                        comp[link.other] = start
                        stack.append(link.other)
        groups: Dict[int, List[int]] = {}
        for nid, c in comp.items():
            groups.setdefault(c, []).append(nid)
        scalar = 1.0
        open_groups = []
        for c, members in groups.items():
            if any(l.external for m in members for l in self.nodes[m].neighbors):
                open_groups.append(members)
                continue
            # fully closed subnetwork -> scalar
            res = self.contract_ids(set(members))
            scalar *= float(self.nodes[res].tensor[0]) if self.nodes[res].tensor.degree() == 0 \
                else float(self.nodes[res].tensor[[0] * self.nodes[res].tensor.degree()])
            self.nodes[res].erase()
        if self.degree() == 0 and not open_groups:
            # whole network was closed: keep a single scalar node
            t = Tensor([], Representation.Dense)
            t._dense = np.array(scalar, dtype=config.value_dtype)
            self.nodes.append(TensorNode(t, []))
            return
        if scalar != 1.0:
            for members in open_groups[:1]:
                self.nodes[members[0]].tensor.factor *= scalar

    # ------------------------------------------------------------------
    # Core-chain ops used by the TT layer (tensorNetwork.cpp:678, 821)
    # ------------------------------------------------------------------
    def transfer_core(self, frm: int, to: int, allow_rank_reduction: bool = True) -> None:
        """QR/QC split of node `frm`: orthogonal part stays, the non-orthogonal
        factor is contracted into node `to` (tensorNetwork.cpp:821-870)."""
        pos_f, pos_t = self.find_common_edge(frm, to)
        nf = self.nodes[frm]
        # matricize: all modes except pos_f  x  pos_f
        other = [p for p in range(nf.degree()) if p != pos_f]
        perm_target = other + [pos_f]
        t = nf.tensor
        if perm_target != list(range(nf.degree())):
            t = core_reshuffle(t, [perm_target.index(p) for p in range(nf.degree())])
        if allow_rank_reduction:
            Q, C = fact.calculate_qc(t, t.degree() - 1)
        else:
            Q, C = fact.calculate_qr(t, t.degree() - 1)
        new_rank = Q.dimensions[-1]
        # Q back into frm's mode order (rank takes pos_f's place)
        inv = [0] * nf.degree()
        for new_pos, old_pos in enumerate(perm_target):
            inv[old_pos] = new_pos
        Q = core_reshuffle(Q, inv)
        self.nodes[frm] = TensorNode(Q, nf.neighbors)
        nf = self.nodes[frm]
        nf.neighbors[pos_f].dimension = new_rank

        # contract C (rank x old_edge_dim) into `to` at pos_t
        nt = self.nodes[to]
        tt = nt.tensor
        other_t = [p for p in range(nt.degree()) if p != pos_t]
        perm_t_target = [pos_t] + other_t
        if perm_t_target != list(range(nt.degree())):
            tt = core_reshuffle(tt, [perm_t_target.index(p) for p in range(nt.degree())])
        merged = core_contract(C, tt, 1)  # (rank, other_t dims...)
        inv_t = [0] * nt.degree()
        for new_pos, old_pos in enumerate(perm_t_target):
            inv_t[old_pos] = new_pos
        merged = core_reshuffle(merged, inv_t)
        self.nodes[to] = TensorNode(merged, nt.neighbors)
        self.nodes[to].neighbors[pos_t].dimension = new_rank

    def round_edge(self, node_a: int, node_b: int, max_rank: int, eps: float,
                   soft_threshold: float = 0.0) -> None:
        """Truncate the rank of the edge between two nodes via SVD
        (tensorNetwork.cpp:678-804)."""
        pos_a, pos_b = self.find_common_edge(node_a, node_b)
        na, nb = self.nodes[node_a], self.nodes[node_b]

        ta = na.tensor
        other_a = [p for p in range(na.degree()) if p != pos_a]
        perm_a = other_a + [pos_a]
        if perm_a != list(range(na.degree())):
            ta = core_reshuffle(ta, [perm_a.index(p) for p in range(na.degree())])
        tb = nb.tensor
        other_b = [p for p in range(nb.degree()) if p != pos_b]
        perm_b = [pos_b] + other_b
        if perm_b != list(range(nb.degree())):
            tb = core_reshuffle(tb, [perm_b.index(p) for p in range(nb.degree())])

        merged = core_contract(ta, tb, 1)
        U, S, Vt = fact.calculate_svd(merged, len(other_a), max_rank, eps)
        if soft_threshold > 0.0:
            S = _soft_threshold_diag(S, soft_threshold, max_rank)
            # re-truncate by surviving entries
            keep = S.dimensions[0]
            U = _truncate_last_mode(U, keep)
            Vt = _truncate_first_mode(Vt, keep)
        new_rank = S.dimensions[0]
        newA = U
        newB = core_contract(S, Vt, 1)

        inv_a = [0] * na.degree()
        for new_pos, old_pos in enumerate(perm_a):
            inv_a[old_pos] = new_pos
        newA = core_reshuffle(newA, inv_a)
        inv_b = [0] * nb.degree()
        for new_pos, old_pos in enumerate(perm_b):
            inv_b[old_pos] = new_pos
        newB = core_reshuffle(newB, inv_b)

        self.nodes[node_a] = TensorNode(newA, na.neighbors)
        self.nodes[node_b] = TensorNode(newB, nb.neighbors)
        self.nodes[node_a].neighbors[pos_a].dimension = new_rank
        self.nodes[node_b].neighbors[pos_b].dimension = new_rank

    def reduce_representation(self) -> None:
        """Contract edges whose dimension exceeds the size of the smaller
        endpoint (tensorNetwork.cpp reduce_representation)."""
        changed = True
        while changed:
            changed = False
            for nid, node in enumerate(self.nodes):
                if node.erased:
                    continue
                for link in node.neighbors:
                    if link.external or link.other == nid:
                        continue
                    r = 1
                    for l in node.neighbors:
                        if l.links(link.other):
                            r *= l.dimension
                    m = node.size() // r
                    n = self.nodes[link.other].size() // r
                    if r * r >= m * n:
                        a, b = min(nid, link.other), max(nid, link.other)
                        self.contract_pair(a, b)
                        changed = True
                        break
                if changed:
                    break

    # ------------------------------------------------------------------
    def draw(self) -> str:
        """Graphviz dot export (tensorNetwork.h:516-520)."""
        lines = ["graph network {", "  node [shape=box];"]
        for nid, node in enumerate(self.nodes):
            if node.erased:
                continue
            lines.append(f'  n{nid} [label="{nid}: '
                         f'{"x".join(str(l.dimension) for l in node.neighbors)}"];')
        seen = set()
        for nid, node in enumerate(self.nodes):
            if node.erased:
                continue
            for pos, link in enumerate(node.neighbors):
                if link.external:
                    lines.append(f'  ext{link.other} [shape=none, label="{link.other}"];')
                    lines.append(f"  n{nid} -- ext{link.other};")
                elif (link.other, link.index_position, nid, pos) not in seen:
                    seen.add((nid, pos, link.other, link.index_position))
                    lines.append(f"  n{nid} -- n{link.other};")
        lines.append("}")
        return "\n".join(lines)

    def __repr__(self) -> str:
        alive = sum(1 for n in self.nodes if not n.erased)
        return f"{type(self).__name__}(dims={self.dimensions}, nodes={alive})"


def _soft_threshold_diag(S: Tensor, tau: float, max_rank: int) -> Tensor:
    """Soft-threshold singular values, dropping zeros."""
    d = np.diag(S.to_ndarray())
    d = np.maximum(d - tau, 0.0)
    keep = max(int(np.sum(d > 0)), 1)
    if max_rank:
        keep = min(keep, max_rank)
    out = Tensor([keep, keep], Representation.Sparse)
    for i in range(keep):
        out._sparse[i * keep + i] = float(d[i])
    return out


def _truncate_last_mode(t: Tensor, keep: int) -> Tensor:
    out = t.copy()
    out.resize_mode(t.degree() - 1, keep)
    return out


def _truncate_first_mode(t: Tensor, keep: int) -> Tensor:
    out = t.copy()
    out.resize_mode(0, keep)
    return out
