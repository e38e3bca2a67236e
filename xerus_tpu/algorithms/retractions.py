"""Riemannian kit: tangent vectors, retractions, vector transport.

Re-design of include/xerus/algorithms/retractions.h and
src/xerus/algorithms/retractions.cpp:28-290.  A ``TTTangentVector`` holds the
projection of a direction onto the tangent space of the rank-r TT manifold at
``base`` (canonicalized at core 0); per-component math runs as jnp einsums.
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax.numpy as jnp

from ..config import config, require
from ..core.tensor import Tensor
from ..core import factorizations as fact
from ..tt.ttnetwork import TTTensor


class TTTangentVector:
    """Tangent vector at ``base`` (retractions.cpp:82-131)."""

    def __init__(self, base: TTTensor = None, direction: TTTensor = None):
        self.baseL: TTTensor = None
        self.components: List[Tensor] = []
        if base is None:
            return
        require(direction is not None, "need both base and direction")
        require(base.dimensions == direction.dimensions,
                "base/direction dimension mismatch")
        self.baseL = base.copy()
        self.baseL.move_core(0, keep_rank=True)
        self._project(direction)

    def _project(self, direction: TTTensor) -> None:
        baseL = self.baseL
        d = baseL.num_components()
        U = [c.to_jax() for c in baseL.components]
        V = [c.to_jax() for c in direction.components]

        # left stacks: UV[i], UU[i] cover components < i (retractions.cpp:89-101)
        one = jnp.ones((1, 1), dtype=config.value_dtype)
        leftUV = [one]
        leftUU = [one]
        for i in range(d - 1):
            leftUV.append(jnp.einsum("ab,arj,brk->jk", leftUV[-1], U[i], V[i]))
            leftUU.append(jnp.einsum("ab,arj,brk->jk", leftUU[-1], U[i], U[i]))

        right = one
        comps: List[Tensor] = [None] * d
        for i in range(d - 1, -1, -1):
            uu = Tensor.from_jax(leftUU[i])
            uu_inv = fact.pseudo_inverse(uu, 1).to_jax()
            v = jnp.einsum("as,sb,brj,cj->arc", uu_inv, leftUV[i], V[i], right)
            if i != 0:
                # project out the base component's span (gauge condition)
                utv = jnp.einsum("arj,brj->ab", v, U[i])
                v = v - jnp.einsum("as,srj->arj", utv, U[i])
                right = jnp.einsum("jra,krb,ab->jk", U[i], V[i], right)
            comps[i] = Tensor.from_jax(v)
        self.components = comps

    # -- arithmetic (retractions.cpp:133-170) ---------------------------
    def __iadd__(self, other: "TTTangentVector") -> "TTTangentVector":
        require(len(self.components) == len(other.components), "length mismatch")
        for i in range(len(self.components)):
            self.components[i] += other.components[i]
        return self

    def __isub__(self, other: "TTTangentVector") -> "TTTangentVector":
        for i in range(len(self.components)):
            self.components[i] -= other.components[i]
        return self

    def __imul__(self, alpha: float) -> "TTTangentVector":
        for c in self.components:
            c *= float(alpha)
        return self

    def __mul__(self, alpha: float) -> "TTTangentVector":
        out = self.copy()
        out *= float(alpha)
        return out

    __rmul__ = __mul__

    def __add__(self, other: "TTTangentVector") -> "TTTangentVector":
        out = self.copy()
        out += other
        return out

    def copy(self) -> "TTTangentVector":
        out = TTTangentVector()
        out.baseL = self.baseL.copy()
        out.components = [c.copy() for c in self.components]
        return out

    def set_base(self, new_base: TTTensor) -> None:
        require(new_base.dimensions == self.baseL.dimensions, "dimension mismatch")
        self.baseL = new_base.copy()
        self.baseL.move_core(0, keep_rank=True)

    # -- metric (retractions.cpp:172-195) -------------------------------
    def scalar_product(self, other: "TTTangentVector") -> float:
        require(len(self.components) == len(other.components), "length mismatch")
        U = [c.to_jax() for c in self.baseL.components]
        left = jnp.ones((1, 1), dtype=config.value_dtype)
        total = 0.0
        for i in range(len(self.components)):
            a = self.components[i].to_jax()
            b = other.components[i].to_jax()
            total += float(jnp.einsum("xy,xrj,yrj->", left, a, b))
            if i + 1 < len(self.components):
                left = jnp.einsum("xy,xrj,yrk->jk", left, U[i], U[i])
        return total

    def frob_norm(self) -> float:
        return float(np.sqrt(max(self.scalar_product(self), 0.0)))

    # -- conversion (retractions.cpp:197-260) ---------------------------
    def _assemble(self, add_base: bool) -> TTTensor:
        """Build the TT for the tangent vector (or base + tangent) via the
        2x2 block construction of change_direction_incomplete."""
        base = self.baseL
        d = base.num_components()
        if d == 1:
            result = TTTensor._make([self.components[0].copy()])
            if add_base:
                result += base
            return result
        comps: List[Tensor] = []
        for i in range(d):
            Ucomp = base.components[i].to_jax()
            Vcomp = self.components[i].to_jax()
            rl, n, rr = Ucomp.shape
            if i == 0:
                first = Ucomp + Vcomp if add_base else Vcomp
                block = jnp.concatenate([Ucomp, first], axis=2)  # (1, n, 2rr)
                comps.append(Tensor.from_jax(block))
            elif i < d - 1:
                top = jnp.concatenate([Ucomp, Vcomp], axis=2)
                bottom = jnp.concatenate([jnp.zeros_like(Ucomp), Ucomp], axis=2)
                block = jnp.concatenate([top, bottom], axis=0)   # (2rl, n, 2rr)
                comps.append(Tensor.from_jax(block))
            else:
                block = jnp.concatenate([Vcomp, Ucomp], axis=0)  # (2rl, n, 1)
                comps.append(Tensor.from_jax(block))
        result = TTTensor._make(comps)
        result.move_core(0)
        return result

    def to_tttensor(self) -> TTTensor:
        return self._assemble(add_base=False)

    def added_to_base(self) -> TTTensor:
        return self._assemble(add_base=True)


# ---------------------------------------------------------------------------
# Retractions (retractions.cpp:30-76, 264-281).  Suffix I takes a tangent
# vector, II takes a TT change.
# ---------------------------------------------------------------------------

def HOSVDRetractionI(U: TTTensor, change: TTTangentVector) -> None:
    old_ranks = U.ranks()
    new = change.added_to_base()
    _overwrite(U, new)
    U.round(old_ranks)


def HOSVDRetractionII(U: TTTensor, change: TTTensor) -> None:
    old_ranks = U.ranks()
    new = U + change
    _overwrite(U, new)
    U.round(old_ranks)


def ALSRetractionI(U: TTTensor, change: TTTangentVector) -> None:
    from .als import ALSVariant
    rounding_als = ALSVariant(1, 2, "lapack", assume_spd=False)
    target = change.added_to_base()
    rounding_als(U, target)


def ALSRetractionII(U: TTTensor, change: TTTensor) -> None:
    from .als import ALSVariant
    rounding_als = ALSVariant(1, 2, "lapack", assume_spd=False)
    target = U + change
    rounding_als(U, target)


def SubmanifoldRetractionI(U: TTTensor, change: TTTangentVector) -> None:
    for i in range(U.num_components()):
        U.components[i] = U.components[i] + change.components[i]
    U.canonicalized = False
    U.move_core(0, keep_rank=True)


def SubmanifoldRetractionII(U: TTTensor, change: TTTensor) -> None:
    W = TTTangentVector(U, change)
    SubmanifoldRetractionI(U, W)


def ProjectiveVectorTransport(new_base: TTTensor, tangent: TTTangentVector) -> None:
    """Transport by re-projection at the new base (retractions.cpp:285-289)."""
    moved = tangent.to_tttensor()
    new_tv = TTTangentVector(new_base, moved)
    tangent.baseL = new_tv.baseL
    tangent.components = new_tv.components


def _overwrite(target: TTTensor, source: TTTensor) -> None:
    target.components = source.components
    target.canonicalized = source.canonicalized
    target.corePosition = source.corePosition
    target.dimensions = source.dimensions


class _CallableWrapper:
    """Copy-constructible callable wrapper matching the reference's
    Python binding classes (python/leastSquares.cpp:83-94): e.g.
    ``TTRetractionI(xe.ALSRetractionI)``."""

    def __init__(self, fn):
        self._fn = fn._fn if isinstance(fn, _CallableWrapper) else fn

    def __call__(self, *args, **kwargs):
        return self._fn(*args, **kwargs)


class TTRetractionI(_CallableWrapper):
    pass


class TTRetractionII(_CallableWrapper):
    pass


class TTVectorTransport(_CallableWrapper):
    pass
