"""Simple numerics utilities: adaptive Romberg integration, bisection,
orthogonal-polynomial bases, sequence-limit extractors.

Re-design of include/xerus/misc/simpleNumerics.h,
src/xerus/misc/simpleNumerics.cpp:37-330 — host-side scalar helpers (the
reference uses them for UQ polynomial bases and convergence analysis);
pure Python/NumPy, no device involvement.
"""

from __future__ import annotations

import math
from typing import Callable, List, Sequence

from ..config import require

_EPS = 2.220446049250313e-16  # double machine epsilon


def integrate(f: Callable[[float], float], a: float, b: float,
              eps: float = _EPS, min_iter: int = 4, max_iter: int = 6,
              branch_factor: int = 7, max_recursion: int = 10,
              relative_error: bool = True) -> float:
    """Adaptive Romberg integration of ``f`` over [a, b]
    (simpleNumerics.cpp:37-96): trapezoid refinement + Richardson table;
    intervals that fail to converge within ``max_iter`` halvings are
    split into ``branch_factor`` parts recursively."""
    require(min_iter > 1, "integrate needs min_iter > 1")
    require(branch_factor > 1, "integrate needs branch_factor > 1")
    lo, hi = min(a, b), max(a, b)
    sign = -1.0 if a > b else 1.0
    if relative_error:
        eps = max(eps, _EPS)
    iterants = [(hi - lo) * (f(lo) + f(hi)) / 2.0]
    h = hi - lo
    error = 1.0
    max_val = abs(iterants[0])
    for it in range(max_iter):
        s = 0.0
        x = lo + h / 2.0
        while x < hi:
            fx = f(x)
            s += fx
            max_val = max(max_val, abs(fx))
            x += h
        h /= 2.0
        s *= h
        s += iterants[-1] / 2.0
        iterants.append(s)
        old_it0 = iterants[0]
        n = len(iterants)
        for k in range(n - 1):
            i = n - 1 - k
            iterants[i - 1] = iterants[i] + (
                (iterants[i] - iterants[i - 1]) / (2.0 ** (2 * (k + 1)) - 1))
        if relative_error:
            if old_it0 != 0:
                error = abs((iterants[0] - old_it0) / old_it0)
            else:
                error = abs(iterants[0] - old_it0)
            if math.isnan(error):
                error = abs(iterants[0] - old_it0)
        else:
            error = abs(iterants[0] - old_it0)
        if it >= min_iter and error <= eps:
            return sign * iterants[0]
    if max_recursion == 0:
        return sign * iterants[0]
    # divide and conquer: split the parts that did not converge easily
    h = (hi - lo) / branch_factor
    if relative_error:
        new_eps = max(abs(iterants[0]), max_val) * eps
    else:
        new_eps = max(eps, math.sqrt(branch_factor) * _EPS
                      * max(abs(iterants[0]), max_val))
    total = 0.0
    for i in range(branch_factor):
        total += integrate(f, lo + i * h, lo + (i + 1) * h, new_eps,
                           min_iter, max_iter, branch_factor,
                           max_recursion - 1, False)
    return sign * total


def integrate_segmented(f: Callable[[float], float], a: float, b: float,
                        segmentation: float, eps: float = 1e-8,
                        min_iter: int = 4, max_iter: int = 6,
                        branch_factor: int = 8,
                        max_recursion: int = 10) -> float:
    """Integrate in fixed-width segments (simpleNumerics.cpp:100-110)."""
    lo, hi = min(a, b), max(a, b)
    sign = -1.0 if a > b else 1.0
    res = 0.0
    x = lo
    while x < hi:
        res += integrate(f, x, min(x + segmentation, hi), eps, min_iter,
                         max_iter, branch_factor, max_recursion)
        x += segmentation
    return sign * res


def find_root_bisection(f: Callable[[float], float], lo: float, hi: float,
                        epsilon: float = 1e-14) -> float:
    """Bisection root finder (simpleNumerics.cpp:113-145)."""
    lo, hi = min(lo, hi), max(lo, hi)
    flo, fhi = f(lo), f(hi)
    require(flo * fhi <= 0,
            "bisection requires inputs to both sides of the root")
    if flo == 0.0:
        return lo
    if fhi == 0.0:
        return hi
    while hi - lo > epsilon:
        mid = (hi + lo) / 2.0
        fmid = f(mid)
        if fmid == 0.0:
            return mid
        require(math.isfinite(fmid),
                f"invalid function value f({mid}) = {fmid} in bisection")
        if flo * fmid < 0:
            hi = mid
        else:
            flo = fmid
            lo = mid
    return (hi + lo) / 2.0


class Polynomial:
    """Monomial-basis polynomial with weighted L2 structure
    (simpleNumerics.h:54-86, .cpp:147-252).  ``coefficients[i]`` is the
    coefficient of x^i."""

    def __init__(self, coefficients: Sequence[float] = ()):  # noqa: D401
        self.coefficients: List[float] = [float(c) for c in coefficients]

    def terms(self) -> int:
        return len(self.coefficients)

    def _resized(self, n: int) -> None:
        while len(self.coefficients) < n:
            self.coefficients.append(0.0)

    def __iadd__(self, rhs: "Polynomial") -> "Polynomial":
        self._resized(rhs.terms())
        for i, c in enumerate(rhs.coefficients):
            self.coefficients[i] += c
        return self

    def __isub__(self, rhs: "Polynomial") -> "Polynomial":
        self._resized(rhs.terms())
        for i, c in enumerate(rhs.coefficients):
            self.coefficients[i] -= c
        return self

    def __imul__(self, rhs: float) -> "Polynomial":
        self.coefficients = [c * rhs for c in self.coefficients]
        return self

    def __itruediv__(self, rhs: float) -> "Polynomial":
        self.coefficients = [c / rhs for c in self.coefficients]
        return self

    def __mul__(self, rhs):
        if isinstance(rhs, Polynomial):
            out = [0.0] * (self.terms() + rhs.terms() - 1)
            for i, ci in enumerate(self.coefficients):
                for j, cj in enumerate(rhs.coefficients):
                    out[i + j] += ci * cj
            return Polynomial(out)
        return Polynomial([c * rhs for c in self.coefficients])

    __rmul__ = __mul__

    def __call__(self, x: float) -> float:
        result = 0.0
        for c in reversed(self.coefficients):
            result = result * x + c
        return result

    def scalar_product(self, rhs: "Polynomial",
                       weight: Callable[[float], float],
                       min_x: float, max_x: float) -> float:
        return integrate(lambda x: self(x) * rhs(x) * weight(x),
                         min_x, max_x, 1e-10)

    def norm(self, weight: Callable[[float], float],
             min_x: float, max_x: float) -> float:
        return math.sqrt(self.scalar_product(self, weight, min_x, max_x))

    def orthogonolize(self, ortho_base: Sequence["Polynomial"],
                      weight: Callable[[float], float],
                      min_x: float, max_x: float) -> "Polynomial":
        """Orthogonalize against an (already orthonormal) basis, in place
        (the reference's spelling, simpleNumerics.cpp:232)."""
        for b in ortho_base:
            self -= b * self.scalar_product(b, weight, min_x, max_x)
        self /= self.norm(weight, min_x, max_x)
        return self

    orthogonalize = orthogonolize   # sane spelling alias

    @staticmethod
    def build_orthogonal_base(n: int, weight: Callable[[float], float],
                              min_x: float, max_x: float
                              ) -> List["Polynomial"]:
        """n orthonormal polynomials w.r.t. the weighted L2 product
        (simpleNumerics.cpp:244-252; used by the reference's UQ Hermite
        bases)."""
        base: List[Polynomial] = []
        while len(base) < n:
            nxt = Polynomial([0.0] * len(base) + [1.0])  # x^len(base)
            nxt.orthogonolize(base, weight, min_x, max_x)
            base.append(nxt)
        return base


class ShanksTransformation:
    """Sequence-limit extraction via the Shanks/Aitken process
    (simpleNumerics.h:105-123, .cpp:257-295)."""

    def __init__(self):
        self.values: List[float] = []

    @staticmethod
    def shanks(x1: float, x2: float, x3: float) -> float:
        den = x1 - 2 * x2 + x3
        if abs(den) < _EPS * max(x1, x2, x3):
            return x2
        return (x1 * x3 - x2 * x2) / den

    def push_back(self, val: float) -> None:
        self.values.append(float(val))
        i = len(self.values) - 1
        while i >= 2:
            self.values[i - 2] = self.shanks(
                self.values[i - 2], self.values[i - 1], self.values[i])
            i -= 2

    def best_estimate(self) -> float:
        require(bool(self.values),
                "tried to extract limit of empty sequence")
        return self.values[(len(self.values) - 1) % 2]

    def error_approximate(self) -> float:
        i = (len(self.values) - 1) % 2
        if i + 1 >= len(self.values):
            return 1.0
        return abs(self.values[i] - self.values[i + 1])

    def reset(self) -> None:
        self.values.clear()


class RichardsonExtrapolation:
    """Sequence-limit extraction via Richardson extrapolation
    (simpleNumerics.h:128-146, .cpp:305-330)."""

    def __init__(self):
        self.values: List[float] = []

    @staticmethod
    def richard(n: int, x1: float, x2: float) -> float:
        return (n + 1) * x2 - n * x1

    def push_back(self, val: float) -> None:
        self.values.append(float(val))
        for i in range(len(self.values) - 1, 0, -1):
            self.values[i - 1] = self.richard(i - 1, self.values[i - 1],
                                              self.values[i])

    def best_estimate(self) -> float:
        require(bool(self.values),
                "tried to extract limit of empty sequence")
        return self.values[0]

    def error_approximate(self) -> float:
        if len(self.values) < 2:
            return 1.0
        return abs(self.values[0] - self.values[1])

    def reset(self) -> None:
        self.values.clear()
