"""ALS approximation of a dense tensor by a TT.

Re-design of src/xerus/algorithms/decompositionAls.cpp:28-66: per position,
project the dense target onto the orthogonal frame around the core.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import config
from ..core.tensor import Tensor
from ..tt.ttnetwork import TTTensor


def _project_position(x: TTTensor, b_arr, pos: int) -> None:
    """x.component(pos) = (left frame)^T b (right frame)."""
    x.move_core(pos)
    d = x.degree()
    # contract b with left components (orthogonal) from the left
    cur = b_arr.reshape((1,) + tuple(x.dimensions) + (1,))  # boundary ranks
    for i in range(pos):
        C = x.components[i].to_jax()       # (rl, n, rr)
        cur = jnp.einsum("anb,an...->b...", C, cur)
    # contract with right components from the right
    for i in range(d - 1, pos, -1):
        C = x.components[i].to_jax()
        cur = jnp.einsum("...nb,anb->...a", cur, C)
    # cur now has shape (rl, n_pos, rr)
    x.components[pos] = Tensor.from_jax(cur)
    x.assume_core_position(pos)


def decomposition_als(x: TTTensor, b: Tensor, eps: float = 1e-6,
                      max_iterations: int = 100) -> None:
    b_arr = b.to_jax()
    last_residual = float(jnp.linalg.norm(
        x.to_tensor().to_jax() - b_arr))
    for _ in range(max_iterations):
        for pos in range(x.degree()):
            _project_position(x, b_arr, pos)
        for pos in range(x.degree() - 2, 0, -1):
            _project_position(x, b_arr, pos)
        residual = float(jnp.linalg.norm(x.to_tensor().to_jax() - b_arr))
        if residual < config.epsilon or \
                (last_residual - residual) / (residual or 1.0) < eps:
            return
        last_residual = residual
