"""Sharded building blocks: the multi-chip compute paths.

New design (no reference counterpart — SURVEY.md §2.6): ADF / measurement
work shards over ``dp`` (the measurement axis), ALS local systems and TT
inner products shard their operator-rank / phys axes over ``tp``.  All
collectives are inserted by GSPMD from sharding constraints — no explicit
psum calls needed outside shard_map.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import config
from .mesh import measurement_sharding, replicated


# ---------------------------------------------------------------------------
# ADF gradient step, dp-sharded over measurements
# ---------------------------------------------------------------------------

def _adf_gradient_core0(cores: List[jnp.ndarray], P_idx: jnp.ndarray,
                        values: jnp.ndarray) -> jnp.ndarray:
    """Projected gradient for core 0 given point measurements.

    P_idx: (M, d) int32 — dp-sharded.  cores: replicated.  The backward
    sweep and the final segment-sum run per-shard; GSPMD inserts the psum
    for the (replicated-output) gradient.
    """
    d = len(cores)
    M = values.shape[0]
    B = jnp.ones((M, 1), dtype=cores[0].dtype)
    for k in range(d - 1, 0, -1):
        taken = jnp.take(cores[k], P_idx[:, k], axis=1)  # (rl, M, rr)
        B = jnp.einsum("amb,mb->ma", taken, B)
    taken0 = jnp.take(cores[0], P_idx[:, 0], axis=1)     # (1, M, r0)
    pred = jnp.einsum("amb,mb->m", taken0, B)
    res = values - pred
    outer = jnp.einsum("m,mb->mb", res, B)               # (M, r0)
    n0 = cores[0].shape[1]
    grad = jnp.zeros((n0, cores[0].shape[2]), dtype=cores[0].dtype
                     ).at[P_idx[:, 0]].add(outer)
    return grad[None, :, :]                               # (1, n0, r0)


def sharded_adf_gradient(cores: List, positions: np.ndarray,
                         values: np.ndarray, mesh: Mesh):
    """Run the dp-sharded ADF gradient for core 0 on the given mesh."""
    ms = measurement_sharding(mesh)
    rep = replicated(mesh)
    P_dev = jax.device_put(jnp.asarray(positions), ms)
    v_dev = jax.device_put(jnp.asarray(values), ms)
    cores_dev = [jax.device_put(jnp.asarray(c), rep) for c in cores]
    fn = jax.jit(_adf_gradient_core0, out_shardings=rep)
    return fn(cores_dev, P_dev, v_dev)


# ---------------------------------------------------------------------------
# ALS local system, tp-sharded over the operator rank axis
# ---------------------------------------------------------------------------

def _als_local_solve(x_cores: List[jnp.ndarray], A_cores: List[jnp.ndarray],
                     b_cores: List[jnp.ndarray]) -> jnp.ndarray:
    """One SPD ALS micro-step at site 0: build envs right-to-left, assemble
    the local operator, solve.  A-cores may carry a tp sharding on their
    rank axes; the env einsums then become tensor-parallel GEMMs."""
    d = len(x_cores)
    dtype = x_cores[0].dtype
    op_env = jnp.ones((1, 1, 1), dtype=dtype)
    rhs_env = jnp.ones((1, 1), dtype=dtype)
    for k in range(d - 1, 0, -1):
        xc, Ac, bc = x_cores[k], A_cores[k], b_cores[k]
        op_env = jnp.einsum("umU,amnb,vnV,UbV->uav", xc, Ac, xc, op_env)
        rhs_env = jnp.einsum("umU,bmB,UB->ub", xc, bc, rhs_env)
    L = jnp.ones((1, 1, 1), dtype=dtype)
    Lb = jnp.ones((1, 1), dtype=dtype)
    Aloc = jnp.einsum("uav,amnb,UbV->umUvnV", L, A_cores[0], op_env)
    bloc = jnp.einsum("ub,bmB,UB->umU", Lb, b_cores[0], rhs_env)
    n = bloc.size
    sol = jnp.linalg.solve(Aloc.reshape(n, n), bloc.reshape(n))
    return sol.reshape(bloc.shape)


def _tp_sharding(mesh: Mesh, shape: Tuple[int, ...], prefer=()):
    """NamedSharding that puts ``tp`` on the first axis (trying ``prefer``
    order, then all axes) whose size divides by the tp extent; replicated
    when none does.  Small TT cores routinely have axes (ranks, phys dims)
    smaller than the mesh axis — an unconditional spec then fails
    device_put with a divisibility error (found at 16 virtual devices:
    tp=4 over a phys dim of 2)."""
    tp = mesh.shape["tp"]
    for ax in list(prefer) + list(range(len(shape))):
        if shape[ax] % tp == 0:
            spec = [None] * len(shape)
            spec[ax] = "tp"
            return NamedSharding(mesh, P(*spec))
    return replicated(mesh)


def sharded_als_local_solve(x_cores, A_cores, b_cores, mesh: Mesh):
    rep = replicated(mesh)
    x_dev = [jax.device_put(jnp.asarray(c), rep) for c in x_cores]
    # shard operator cores over a divisible axis (phys preferred, then
    # ranks): the env einsum partial-sums over every A axis, so GSPMD
    # inserts the all-reduce wherever tp lands
    A_dev = []
    for c in A_cores:
        c = jnp.asarray(c)
        A_dev.append(jax.device_put(
            c, _tp_sharding(mesh, c.shape, prefer=(2, 1, 0, 3))))
    b_dev = [jax.device_put(jnp.asarray(c), rep) for c in b_cores]
    fn = jax.jit(_als_local_solve, out_shardings=rep)
    return fn(x_dev, A_dev, b_dev)


# ---------------------------------------------------------------------------
# TT inner product with phys-axis sharding
# ---------------------------------------------------------------------------

def _tt_inner(a_cores: List[jnp.ndarray], b_cores: List[jnp.ndarray]):
    env = jnp.ones((1, 1), dtype=a_cores[0].dtype)
    for ca, cb in zip(a_cores, b_cores):
        env = jnp.einsum("uv,unU,vnV->UV", env, ca, cb)
    return env[0, 0]


def sharded_tt_inner(a_cores, b_cores, mesh: Mesh):
    a_dev = [jax.device_put(jnp.asarray(c),
                            _tp_sharding(mesh, jnp.shape(c), prefer=(1,)))
             for c in a_cores]
    b_dev = [jax.device_put(jnp.asarray(c),
                            _tp_sharding(mesh, jnp.shape(c), prefer=(1,)))
             for c in b_cores]
    fn = jax.jit(_tt_inner, out_shardings=replicated(mesh))
    return fn(a_dev, b_dev)


# ---------------------------------------------------------------------------
# dp-sharded throughput-mode sweeps: the batched ALS/DMRG half-sweeps
# (ops/tt_kernels.py, ops/dmrg_kernels.py) with the INSTANCE axis sharded
# over the mesh — embarrassingly parallel (each instance's sweep is
# independent), so GSPMD partitions the vmapped program with zero
# collectives; p devices run p instances concurrently.
# ---------------------------------------------------------------------------

def sharded_als_half_sweep_batched(x_batch, A_cores, b_batch, mesh: Mesh,
                                   direction: str = "lr"):
    """Batched SPD ALS half-sweep with the batch axis sharded over `dp`."""
    from ..ops.tt_kernels import make_als_sweep_batched
    bs = NamedSharding(mesh, P("dp"))
    rep = replicated(mesh)
    x_dev = tuple(jax.device_put(jnp.asarray(c), bs) for c in x_batch)
    b_dev = tuple(jax.device_put(jnp.asarray(c), bs) for c in b_batch)
    A_dev = tuple(jax.device_put(jnp.asarray(c), rep) for c in A_cores)
    shapes_key = (tuple(tuple(c.shape) for c in x_dev),
                  tuple(tuple(c.shape) for c in A_dev),
                  tuple(tuple(c.shape) for c in b_dev))
    fn = make_als_sweep_batched(shapes_key, str(x_dev[0].dtype), direction)
    return fn(x_dev, A_dev, b_dev)


def sharded_dmrg_half_sweep_batched(x_stacks, A_stack, rank: int, mesh: Mesh,
                                    solver: str = "lanczos",
                                    lobpcg_iters: int = 32):
    """Batched DMRG ground-state half-sweep, instance axis sharded over
    `dp`.  Returns (new_stacks, energies)."""
    from ..ops.dmrg_kernels import make_dmrg_sweep_batched
    bs = NamedSharding(mesh, P("dp"))
    rep = replicated(mesh)
    x_dev = jax.device_put(jnp.asarray(x_stacks), bs)
    A_dev = jax.device_put(jnp.asarray(A_stack), rep)
    fn = make_dmrg_sweep_batched(tuple(x_dev.shape), int(rank),
                                 str(x_dev.dtype), int(lobpcg_iters), solver)
    return fn(x_dev, A_dev)


# ---------------------------------------------------------------------------
# Full multi-chip training step (used by __graft_entry__.dryrun_multichip)
# ---------------------------------------------------------------------------

def multichip_training_step(mesh: Mesh, d: int = 6, n: int = 2, rank: int = 3,
                            num_meas: int = 32):
    """One combined sharded step: dp-sharded ADF gradient + tp-sharded ALS
    local solve + tp-sharded inner product, jitted over the mesh."""
    from .. import misc as _misc
    rng = _misc.randomEngine
    dtype = config.value_dtype

    def mk_tt(seed_shift=0):
        cores = []
        for i in range(d):
            rl = 1 if i == 0 else rank
            rr = 1 if i == d - 1 else rank
            cores.append(jnp.asarray(rng.normal(size=(rl, n, rr)), dtype=dtype))
        return cores

    x_cores = mk_tt()
    b_cores = mk_tt()
    A_cores = []
    for i in range(d):
        rl = 1 if i == 0 else 2
        rr = 1 if i == d - 1 else 2
        A_cores.append(jnp.asarray(
            rng.normal(size=(rl, n, n, rr)), dtype=dtype)
            + jnp.eye(n, dtype=dtype)[None, :, :, None] * (3.0 if rl == rr == 1 else 0.0))

    positions = rng.integers(0, n, size=(num_meas, d)).astype(np.int64)
    values = rng.normal(size=(num_meas,)).astype(dtype)

    with mesh:
        grad = sharded_adf_gradient(x_cores, positions, values, mesh)
        sol = sharded_als_local_solve(x_cores, A_cores, b_cores, mesh)
        ip = sharded_tt_inner(x_cores, b_cores, mesh)
    return np.asarray(grad), np.asarray(sol), float(ip)
