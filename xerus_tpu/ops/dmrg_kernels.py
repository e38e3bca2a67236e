"""Whole-sweep jitted two-site DMRG ground-state kernel.

Fast path for the eigensolver (algorithms/eigensolver.py): a full
left->right half-sweep of two-site local eigenproblems compiled into ONE XLA
program.  Ranks stay FIXED at the given value (pad-to-max-rank discipline,
SURVEY.md §7): the SVD split keeps exactly `rank` singular directions via a
static mask, so shapes are uniform and the eigh/SVD bodies compile once per
distinct shape.

Fixed ranks require a full-rank start (e.g. TTTensor.random at max rank);
the spurious zero-mode issue of zero-padded frames does not arise.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _dmrg_eig_half_sweep(x_cores, A_cores):
    """Two-site ground-state half-sweep (lr); x canonicalized at 0.
    Returns (new cores, energy of the last local problem)."""
    d = len(x_cores)
    dtype = x_cores[0].dtype

    op_right = [jnp.ones((1, 1, 1), dtype=dtype)]
    for k in range(d - 1, 1, -1):
        xc, Ac = x_cores[k], A_cores[k]
        op_right.append(jnp.einsum("umU,amnb,vnV,UbV->uav", xc, Ac, xc,
                                   op_right[-1]))

    x_cores = list(x_cores)
    op_left = jnp.ones((1, 1, 1), dtype=dtype)
    energy = jnp.zeros((), dtype)
    for k in range(d - 1):
        A1, A2 = A_cores[k], A_cores[k + 1]
        R = op_right[d - 2 - k]
        Aloc = jnp.einsum("uav,amnb,bMNc,UcV->umMUvnNV", op_left, A1, A2, R)
        u_, m_, M_, U_ = Aloc.shape[:4]
        nn = u_ * m_ * M_ * U_
        w, v = jnp.linalg.eigh(Aloc.reshape(nn, nn))
        energy = w[0]
        ground = v[:, 0].reshape(u_, m_ * M_, U_).reshape(u_ * m_, M_ * U_)
        # split with rank kept EXACTLY at the bond dimension of x (static)
        r_bond = x_cores[k].shape[2]
        uu, ss, vt = jnp.linalg.svd(ground.reshape(u_ * m_, M_ * U_),
                                    full_matrices=False)
        keep = min(r_bond, uu.shape[1])
        mask = (jnp.arange(uu.shape[1]) < keep).astype(dtype)
        uu = uu * mask[None, :]
        sv = (ss * mask)[:, None] * vt
        # pad/trim to the static bond dimension
        if uu.shape[1] >= r_bond:
            uu = uu[:, :r_bond]
            sv = sv[:r_bond, :]
        else:
            uu = jnp.pad(uu, ((0, 0), (0, r_bond - uu.shape[1])))
            sv = jnp.pad(sv, ((0, r_bond - sv.shape[0]), (0, 0)))
        x_cores[k] = uu.reshape(u_, m_, r_bond)
        x_cores[k + 1] = sv.reshape(r_bond, M_, U_)
        if k < d - 2:
            op_left = jnp.einsum("uav,umU,amnb,vnV->UbV", op_left,
                                 x_cores[k], A1, x_cores[k])
    return tuple(x_cores), energy


@lru_cache(maxsize=32)
def make_dmrg_sweep(shapes_key, dtype_str: str):
    return jax.jit(_dmrg_eig_half_sweep)


def dmrg_groundstate_fast(A, x, num_half_sweeps: int = 8,
                          conv_eps: float = 1e-10):
    """Object-level driver: alternating jitted half-sweeps via site reversal;
    returns (energy, x updated in place)."""
    from ..core.tensor import Tensor
    x.move_core(0)
    nrm = x.frob_norm()
    if nrm > 0:
        x /= nrm
    cores = tuple(c.to_jax() for c in x.components)
    A_cores = tuple(c.to_jax() for c in A.components)

    def rev_tt(cs):
        return tuple(jnp.transpose(c, (2, 1, 0)) for c in reversed(cs))

    def rev_op(cs):
        return tuple(jnp.transpose(c, (3, 1, 2, 0)) for c in reversed(cs))

    energy = np.inf
    reversed_state = False
    for sweep in range(num_half_sweeps):
        shapes_key = tuple(tuple(c.shape) for c in cores)
        fn = make_dmrg_sweep(shapes_key, str(cores[0].dtype))
        cores, e = fn(cores, A_cores)
        e = float(e)
        # normalize (keeps f32 healthy over many sweeps)
        last = cores[-1]
        n = jnp.linalg.norm(last)
        cores = cores[:-1] + (last / jnp.maximum(n, 1e-30),)
        if abs(e - energy) < conv_eps:
            energy = e
            break
        energy = e
        cores = rev_tt(cores)
        A_cores = rev_op(A_cores)
        reversed_state = not reversed_state
    if reversed_state:
        cores = rev_tt(cores)
    x.components = [Tensor.from_jax(c) for c in cores]
    x.canonicalized = False
    x.move_core(0)
    n = x.frob_norm()
    if n > 0:
        x /= n
    return energy
