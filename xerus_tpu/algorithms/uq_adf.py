"""UQ-ADF: reconstruct a solution TT over stochastic (Hermite) modes from
samples.

Re-design of src/xerus/algorithms/uqAdf.cpp:30-477.  Mode 0 is the physical
mode; modes 1..d-1 carry Hermite-polynomial embeddings of the random
variables (randVar_to_position, uqAdf.cpp:39-50).  The reference's
OpenMP-parallel per-sample loops become batched (N, ...) jnp einsums that
shard over the sample axis (SURVEY.md §2.6a).
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ..config import config, require
from ..core.tensor import Tensor
from ..tt.ttnetwork import TTTensor
from .. import misc as _misc


def randvar_to_position(v: float, poly_degree: int) -> np.ndarray:
    """Probabilists' Hermite embedding He_i(v) = H_i(v/sqrt2)/2^(i/2)
    (uqAdf.cpp:39-50)."""
    p = np.zeros(poly_degree, dtype=config.value_dtype)
    # probabilists' Hermite via recurrence He_0=1, He_1=v, He_{n+1}=v He_n - n He_{n-1}
    for i in range(poly_degree):
        if i == 0:
            p[i] = 1.0
        elif i == 1:
            p[i] = v
        else:
            p[i] = v * p[i - 1] - (i - 1) * p[i - 2]
    return p


class UQMeasurementSet:
    """(uqAdf.h:35-50)"""

    def __init__(self):
        self.randomVectors: List[List[float]] = []
        self.solutions: List[Tensor] = []
        self.initialRandomVectors: List[List[float]] = []
        self.initialSolutions: List[Tensor] = []

    def add(self, rndvec: Sequence[float], solution: Tensor) -> None:
        self.randomVectors.append(list(rndvec))
        self.solutions.append(solution.copy() if isinstance(solution, Tensor)
                              else Tensor.from_ndarray(solution))

    def add_initial(self, rndvec: Sequence[float], solution: Tensor) -> None:
        self.initialRandomVectors.append(list(rndvec))
        self.initialSolutions.append(solution.copy())


class _UQInternalSolver:
    def __init__(self, x: TTTensor, random_variables, solutions):
        require(len(random_variables) == len(solutions),
                "need one solution per random vector")
        self.x = x
        self.N = len(solutions)
        self.d = x.degree()
        self.sols = jnp.asarray(np.stack(
            [np.asarray(s.to_ndarray() if isinstance(s, Tensor) else s)
             for s in solutions]))                       # (N, n0)
        self.sol_norm = float(jnp.linalg.norm(self.sols)) or 1.0
        # positions[k]: (N, n_k) Hermite embeddings, k = 1..d-1
        self.pos: List = [None]
        for k in range(1, self.d):
            self.pos.append(jnp.asarray(np.stack(
                [randvar_to_position(rv[k - 1], x.dimensions[k])
                 for rv in random_variables])))
        self.right: List = [None] * self.d       # right[k]: (N, r_{k-1})
        self.left_is: List = [None] * self.d     # (N, r_k, r_k)
        self.left_ought: List = [None] * self.d  # (N, r_k)

    def calc_right(self, k: int) -> None:
        C = self.x.components[k].to_jax()         # (rl, n, rr)
        if k < self.d - 1:
            self.right[k] = jnp.einsum("mn,anb,mb->ma", self.pos[k], C,
                                       self.right[k + 1])
        else:
            self.right[k] = jnp.einsum("mn,anb->ma", self.pos[k],
                                       C)  # rr == 1 folded

    def calc_left(self, k: int) -> None:
        C = self.x.components[k].to_jax()
        if k == 0:
            X0 = C.reshape(C.shape[1], C.shape[2])   # (n0, r0)
            self.left_ought[0] = jnp.einsum("mn,nb->mb", self.sols, X0)
            self.left_is[0] = None  # identity
        else:
            meas = jnp.einsum("mn,anb->mab", self.pos[k], C)  # (N, rl, rr)
            if k > 1:
                self.left_is[k] = jnp.einsum("mab,mac,mcd->mbd", meas,
                                             self.left_is[k - 1], meas)
            else:
                self.left_is[k] = jnp.einsum("mab,mac->mbc", meas, meas)
            self.left_ought[k] = jnp.einsum("ma,mab->mb",
                                            self.left_ought[k - 1], meas)

    def calculate_delta(self, k: int):
        C = self.x.components[k].to_jax()
        if k == 0:
            X0 = C.reshape(C.shape[1], C.shape[2])
            pred = jnp.einsum("nb,mb->mn", X0, self.right[1])   # (N, n0)
            delta = jnp.einsum("mn,mb->nb", pred - self.sols, self.right[1])
            return delta.reshape(C.shape)
        # dyadic part: pos_k (x) right_{k+1} (or pos_k alone at the end)
        if k < self.d - 1:
            is_part = jnp.einsum("mn,anb,mb->ma", self.pos[k], C,
                                 self.right[k + 1])
        else:
            is_part = jnp.einsum("mn,anb->ma", self.pos[k], C)
        if k > 1:
            is_part = jnp.einsum("mab,mb->ma", self.left_is[k - 1], is_part)
        diff = is_part - self.left_ought[k - 1]                  # (N, rl)
        if k < self.d - 1:
            delta = jnp.einsum("ma,mn,mb->anb", diff, self.pos[k],
                               self.right[k + 1])
        else:
            delta = jnp.einsum("ma,mn->an", diff, self.pos[k])[:, :, None]
        return delta

    def norm_A_proj_grad(self, delta, k: int) -> float:
        if k == 0:
            tmp = jnp.einsum("anb,mb->mn", delta.reshape(delta.shape),
                             self.right[1])
            return float(jnp.sqrt(jnp.sum(tmp * tmp)))
        if k < self.d - 1:
            right_part = jnp.einsum("mn,anb,mb->ma", self.pos[k], delta,
                                    self.right[k + 1])
        else:
            right_part = jnp.einsum("mn,anb->ma", self.pos[k], delta)
        if k > 1:
            val = jnp.einsum("ma,mab,mb->m", right_part, self.left_is[k - 1],
                             right_part)
        else:
            val = jnp.einsum("ma,ma->m", right_part, right_part)
        return float(jnp.sqrt(jnp.maximum(jnp.sum(val), 0.0)))

    def residual_norm(self) -> float:
        C = self.x.components[0].to_jax()
        X0 = C.reshape(C.shape[1], C.shape[2])
        pred = jnp.einsum("nb,mb->mn", X0, self.right[1])
        return float(jnp.linalg.norm(pred - self.sols)) / self.sol_norm

    def solve(self, max_iterations: int = 1000) -> None:
        residuals = [1000.0] * 10
        for _ in range(max_iterations):
            self.x.move_core(0, keep_rank=True)
            for k in range(self.d - 1, 0, -1):
                self.calc_right(k)
            for k in range(self.d):
                if k == 0:
                    residuals.append(self.residual_norm())
                    if residuals[-1] / residuals[-10] > 0.99:
                        return
                delta = self.calculate_delta(k)
                norm_grad = self.norm_A_proj_grad(delta, k)
                pyr = float(jnp.sum(delta * delta))
                if norm_grad > 0:
                    step = pyr / (norm_grad * norm_grad)
                    self.x.components[k] = Tensor.from_jax(
                        self.x.components[k].to_jax() - step * delta)
                    self.x.assume_core_position(k)
                if k + 1 < self.d:
                    self.x.move_core(k + 1, keep_rank=True)
                    self.calc_left(k)


def uq_adf(arg1, arg2, solutions=None, max_iterations: int = 1000):
    """uq_adf(x, random_variables, solutions) or
    uq_adf(measurement_set, guess) (uqAdf.h:54-56)."""
    if isinstance(arg1, UQMeasurementSet):
        ms, guess = arg1, arg2
        if ms.initialRandomVectors:
            x = _initial_guess_from_special_samples(ms, guess)
            rvs = list(ms.randomVectors) + list(ms.initialRandomVectors)
            sols = list(ms.solutions) + list(ms.initialSolutions)
        else:
            x = guess.copy()
            rvs, sols = list(ms.randomVectors), list(ms.solutions)
        _UQInternalSolver(x, rvs, sols).solve(max_iterations)
        return x
    x, random_variables = arg1, arg2
    _UQInternalSolver(x, random_variables, solutions).solve(max_iterations)
    return None


def _initial_guess_from_special_samples(ms: UQMeasurementSet,
                                        guess: TTTensor) -> TTTensor:
    """Mean + per-direction linear terms from axis-aligned initial samples
    (uqAdf.cpp:334-407)."""
    dims = list(guess.dimensions)
    sols = [s.to_ndarray() if isinstance(s, Tensor) else np.asarray(s)
            for s in ms.solutions]
    mean = np.mean(np.stack(sols), axis=0)

    def term(first_vec, active: int = -1) -> TTTensor:
        comps = [Tensor.from_ndarray(first_vec.reshape(1, dims[0], 1))]
        for k in range(1, len(dims)):
            pos = 0 if (active < 0 or k - 1 == active) else 1
            comps.append(Tensor.dirac([1, dims[k], 1], [0, pos, 0]))
        out = TTTensor._make(comps)
        out.assume_core_position(0)
        return out

    new_x = term(mean)
    for m, rv in enumerate(ms.initialRandomVectors):
        init_sol = (ms.initialSolutions[m].to_ndarray()
                    if isinstance(ms.initialSolutions[m], Tensor)
                    else np.asarray(ms.initialSolutions[m]))
        new_x += term(init_sol - mean, active=m)
    new_x.round(0.00025)
    return new_x


def uq_mc(x: TTTensor, N: int, num_special: int = 0
          ) -> Tuple[List[List[float]], List[Tensor]]:
    """Monte-Carlo sample (random vectors, solutions) from a UQ TT
    (uqAdf.cpp:425-448)."""
    rng = _misc.randomEngine
    random_variables = []
    solutions = []
    for _ in range(N):
        rv = []
        p = jnp.ones((1,), dtype=config.value_dtype)
        for k in range(x.degree() - 1, 0, -1):
            v = (0.3 if k <= num_special else 1.0) * float(rng.normal())
            rv.insert(0, v)
            C = x.components[k].to_jax()
            w = jnp.asarray(randvar_to_position(v, x.dimensions[k]))
            p = jnp.einsum("anb,b,n->a", C, p, w)
        C0 = x.components[0].to_jax()
        sol = jnp.einsum("anb,b->n", C0, p)
        solutions.append(Tensor.from_jax(sol))
        random_variables.append(rv)
    return random_variables, solutions


def uq_avg(x: TTTensor, N: int, num_special: int = 0) -> Tensor:
    """Monte-Carlo average of the physical mode (uqAdf.cpp:451-477)."""
    _, sols = uq_mc(x, N, num_special)
    acc = sols[0].to_jax()
    for s in sols[1:]:
        acc = acc + s.to_jax()
    return Tensor.from_jax(acc / N)
