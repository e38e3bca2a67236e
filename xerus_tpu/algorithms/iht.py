"""IHT — iterative hard thresholding for tensor completion.

Re-design of src/xerus/algorithms/iht.cpp:28-155: per iteration, build an
augmented TT ``largeX`` whose extra rank slots carry one rank-1 update per
measurement scaled by the scaled residual, project it back to the rank of x
by one ALS-like sweep, and keep the step size that best reduces the sampled
residual.
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax.numpy as jnp

from ..config import config
from ..core.tensor import Tensor
from ..tt.ttnetwork import TTTensor
from .measurements import SinglePointMeasurementSet, _evaluate_tt_at_points
from .performance_data import PerformanceData, NoPerfData

_ALPHA_CHG = 1.1


def _build_large_x(x: TTTensor, positions: np.ndarray, scaled_residuals) -> TTTensor:
    """x plus per-measurement rank-1 dirac updates in extra rank slots
    (iht.cpp:73-105)."""
    M = positions.shape[0]
    d = x.degree()
    comps: List[Tensor] = []
    for k in range(d):
        C = np.asarray(x.components[k].to_ndarray())
        rl, n, rr = C.shape
        new_rl = 1 if k == 0 else rl + M
        new_rr = 1 if k == d - 1 else rr + M
        new = np.zeros((new_rl, n, new_rr), dtype=config.value_dtype)
        new[:rl if k else 1, :, :rr if k != d - 1 else 1] = C
        idx = positions[:, k]
        m_range = np.arange(M)
        if k == 0:
            new[0, idx, rr + m_range] = scaled_residuals
        elif k != d - 1:
            new[rl + m_range, idx, rr + m_range] = 1.0
        else:
            new[rl + m_range, idx, 0] = 1.0
        comps.append(Tensor.from_ndarray(new))
    return TTTensor._make(comps)


def _project_to_x_ranks(x: TTTensor, large: TTTensor) -> TTTensor:
    """One ALS projection sweep of ``large`` onto x's rank manifold
    (iht.cpp:108-131)."""
    new_x = x.copy()
    new_x.move_core(0, keep_rank=True)
    d = x.degree()
    # right stack of overlaps <new_x_i, large_i>
    stack = [jnp.ones((1, 1), dtype=config.value_dtype)]
    for i in range(d - 1, 0, -1):
        xc = new_x.components[i].to_jax()
        lc = large.components[i].to_jax()
        stack.append(jnp.einsum("anb,cnd,bd->ac", xc, lc, stack[-1]))
    left = jnp.ones((1, 1), dtype=config.value_dtype)
    for i in range(d):
        lc = large.components[i].to_jax()
        new_core = jnp.einsum("ab,bnc,dc->and", left, lc, stack[-1])
        new_x.components[i] = Tensor.from_jax(new_core)
        new_x.assume_core_position(i)
        if i + 1 < d:
            new_x.move_core(i + 1, keep_rank=True)
            xc = new_x.components[i].to_jax()
            left = jnp.einsum("ab,anc,bnd->cd", left, xc, lc)
            stack.pop()
    return new_x


def IHT(x: TTTensor, measurements: SinglePointMeasurementSet,
        perf_data: PerformanceData = NoPerfData,
        max_iterations: int = 100) -> float:
    positions = measurements.positions
    values = measurements.measuredValues
    perf_data.start()
    alpha = 1.0
    residual = 1.0
    for iteration in range(max_iterations):
        current = _evaluate_tt_at_points(x, positions)
        best_residual = residual * 2
        new_alpha = alpha
        best_x = None
        beta = 1.0 / _ALPHA_CHG
        while beta < _ALPHA_CHG * 1.5:
            scaled = beta * alpha * (values - current)
            large = _build_large_x(x, positions, scaled)
            new_x = _project_to_x_ranks(x, large)
            new_vals = _evaluate_tt_at_points(new_x, positions)
            res = float(np.linalg.norm(values - new_vals))
            if res <= best_residual:
                best_x = new_x
                best_residual = res
                new_alpha = alpha * beta
            beta *= _ALPHA_CHG
        if best_x is not None:
            x.components = best_x.components
            x.canonicalized = best_x.canonicalized
            x.corePosition = best_x.corePosition
        residual = best_residual
        alpha = new_alpha
        perf_data.add(residual, x, 0, iteration=iteration)
        if residual < 1e-10 * (np.linalg.norm(values) or 1.0):
            break
    return residual
