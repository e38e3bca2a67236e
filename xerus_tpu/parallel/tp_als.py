"""Tensor-parallel single-instance ALS half-sweep (SURVEY.md §2.6(b)).

Shards the RANK axis of the per-site ALS GEMMs of ONE system over a mesh
axis, under `shard_map` — the missing centerpiece of the multi-chip story
flagged in VERDICT r1 (the other parallel modes are dp over independent
instances, `sharded_ops.sharded_als_half_sweep_batched`, and rank-sharded
rounding, `tsqr_round`).

Design (one XLA program per half-sweep, same sweep math as the serial
`ops.tt_kernels._als_half_sweep`, als.cpp:483-564):

* The dominant per-site tensors are the local operator's row blocks
  (r*n*r/p, r*n*r) and their products.  Each device assembles only ITS row
  block of the local operator from the left environment's u-slice —
  `einsum("uav,amnb,UbV->umUvnV")` split p-ways on u.
* The local SPD solve is matrix-free CG on the sharded rows: one
  `all_gather` of the (r*n*r/p) partial mat-vec per iteration; CG scalars
  replicate automatically.
* Environment pushes contract the sharded u axis: each device contracts
  its slice, one `psum` restores the replicated (small) environment.
* x/A/b cores stay replicated (they are tiny, r*n*r each); the *work*
  is sharded, which is what tensor parallelism buys here.

Collectives are r*n*r/p-sized and ride ICI.  The reference has no
distributed layer at all (SURVEY.md §2.6); the serial kernel is the
correctness oracle (tests/test_parallel.py, 8-virtual-device CPU mesh).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

_MESHES = {}


def _tp_als_half_sweep_local(x_stack, A_stack, b_stack, *, p: int, axis: str,
                             cg_iters: int, x_true: tuple):
    """Per-device body.  x_stack: (d, r, n, r) replicated (boundary bonds
    zero-padded, pad-to-max-rank discipline); A_stack: (d, a, n, n, a);
    b_stack: (d, rb, n, rb); x_true: static ((rl, rr), ...) true bond dims
    of the input cores.  Returns the updated x stack (replicated).

    Padding discipline: Householder QR of a zero-padded matricization
    leaves JUNK orthonormal columns in the padded slots (unlike shifted
    CholeskyQR, whose padded columns are exactly zero); left unmasked
    they leak real directions into the environments and corrupt later
    local systems (measured 3e-4 on the d=6 Laplace oracle).  Q columns
    beyond the statically-known true bond rank are therefore masked to
    exact zero after every QR."""
    d, r, n, _ = x_stack.shape
    a = A_stack.shape[1]
    rb = b_stack.shape[1]
    dtype = x_stack.dtype
    tiny = jnp.asarray(1e-30, dtype)
    i = jax.lax.axis_index(axis)
    rp = r // p

    def urows(t):
        return jax.lax.dynamic_slice_in_dim(t, i * rp, rp, axis=0)

    # ---- right environments (sequential site chain, sharded GEMMs) ----
    opR = [None] * (d + 1)
    rhsR = [None] * (d + 1)
    e3 = jnp.zeros((r, a, r), dtype).at[0, 0, 0].set(1.0)
    e2 = jnp.zeros((r, rb), dtype).at[0, 0].set(1.0)
    opR[d] = e3
    rhsR[d] = e2
    for k in range(d - 1, 0, -1):
        xc, Ac, bc = x_stack[k], A_stack[k], b_stack[k]
        # each device builds the u-rows of the environment from its
        # bra-core slice; scatter into place and psum to replicate
        part = jnp.einsum("umU,amnb,vnV,UbV->uav", urows(xc), Ac, xc,
                          opR[k + 1], preferred_element_type=dtype)
        full = jnp.zeros((r, a, r), dtype)
        full = jax.lax.dynamic_update_slice_in_dim(full, part, i * rp, axis=0)
        opR[k] = jax.lax.psum(full, axis)
        rpart = jnp.einsum("umU,bmB,UB->ub", urows(xc), bc, rhsR[k + 1],
                           preferred_element_type=dtype)
        rfull = jnp.zeros((r, rb), dtype)
        rfull = jax.lax.dynamic_update_slice_in_dim(rfull, rpart, i * rp,
                                                    axis=0)
        rhsR[k] = jax.lax.psum(rfull, axis)

    # ---- left->right sweep ----
    x_out = [x_stack[k] for k in range(d)]
    opL = jnp.zeros((r, a, r), dtype).at[0, 0, 0].set(1.0)
    rhsL = jnp.zeros((r, rb), dtype).at[0, 0].set(1.0)
    nn = r * n * r
    # static true-rank schedule of the sweep's bonds
    kprev = int(x_true[0][0])
    k_true = []
    for k in range(d - 1):
        kt = min(kprev * n, int(x_true[k][1]))
        k_true.append(kt)
        kprev = kt
    for k in range(d):
        Ac, bc = A_stack[k], b_stack[k]
        R3 = opR[k + 1]
        # my row block of the local operator: rows (u in my slice, m, U)
        rows = jnp.einsum("uav,amnb,UbV->umUvnV", urows(opL), Ac, R3,
                          preferred_element_type=dtype
                          ).reshape(rp * n * r, nn)
        bloc = jnp.einsum("ub,bmB,UB->umU", rhsL, bc, rhsR[k + 1],
                          preferred_element_type=dtype).reshape(nn)

        def matvec(v):
            loc = rows @ v                            # (rp*n*r,)
            return jax.lax.all_gather(loc, axis).reshape(nn)

        # matrix-free CG on the sharded rows (SPD local operator); the
        # active subspace is the unpadded block — padded rows/cols are
        # exactly zero, CG never leaves the range of the operator
        x0 = jnp.zeros((nn,), dtype)
        rvec = bloc - matvec(x0)
        pvec = rvec
        rs = jnp.dot(rvec, rvec)

        def cg_body(_, state):
            xv, rvec, pvec, rs = state
            Ap = matvec(pvec)
            denom = jnp.dot(pvec, Ap)
            alpha = jnp.where(denom > tiny, rs / jnp.maximum(denom, tiny),
                              0.0)
            xv = xv + alpha * pvec
            rvec = rvec - alpha * Ap
            rs_new = jnp.dot(rvec, rvec)
            beta = jnp.where(rs > tiny, rs_new / jnp.maximum(rs, tiny), 0.0)
            pvec = rvec + beta * pvec
            return (xv, rvec, pvec, rs_new)

        sol, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body,
                                         (x0, rvec, pvec, rs))
        core = sol.reshape(r, n, r)
        if k < d - 1:
            q, R2 = jnp.linalg.qr(core.reshape(r * n, r))
            # zero the junk columns beyond the true bond rank (see
            # docstring); R2's rows there are exactly zero already
            colmask = (jnp.arange(r) < k_true[k]).astype(dtype)
            q = (q * colmask[None, :]).reshape(r, n, r)
            x_out[k] = q
            x_out[k + 1] = jnp.einsum("ab,bnc->anc", R2, x_stack[k + 1],
                                      preferred_element_type=dtype)
            x_stack = x_stack.at[k + 1].set(x_out[k + 1])
            # env pushes: contract the sharded u axis (opL's u and the
            # bra q's u coincide in the contraction), psum completes it
            part = jnp.einsum("uav,umU,amnb,vnV->UbV", urows(opL),
                              urows(q), Ac, q,
                              preferred_element_type=dtype)
            opL = jax.lax.psum(part, axis)
            rpart = jnp.einsum("ub,umU,bmB->UB", urows(rhsL), urows(q), bc,
                               preferred_element_type=dtype)
            rhsL = jax.lax.psum(rpart, axis)
        else:
            x_out[k] = core
    return jnp.stack(x_out)


@lru_cache(maxsize=16)
def make_tp_als_half_sweep(mesh_key, shape, a_shape, b_shape,
                           dtype_str: str, axis: str, cg_iters: int,
                           x_true: tuple):
    mesh = _MESHES[mesh_key]
    p = mesh.shape[axis]
    fn = shard_map(
        partial(_tp_als_half_sweep_local, p=p, axis=axis, cg_iters=cg_iters,
                x_true=x_true),
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        check_vma=False)
    # jit_f32 discipline (CLAUDE.md): trace with x64 off so the jnp.arange
    # rank masks stay s32 (s64 iota SIGABRTs this TPU compiler), and keep
    # genuine-f32 matmul precision
    from ..ops.tt_kernels import jit_f32
    return jit_f32(fn, dtype_str)


def tp_als_half_sweep(x_cores: Sequence, A_cores: Sequence,
                      b_cores: Sequence, mesh: Mesh, axis: str = "tp",
                      cg_iters: int = 64) -> List[jnp.ndarray]:
    """One tensor-parallel SPD ALS half-sweep of a single system.

    x must be canonicalized at core 0 (the serial-kernel contract).  Cores
    are zero-padded to the uniform max rank (rounded up to a multiple of
    the mesh axis size); returns cores unpadded to their input shapes."""
    from ..ops.pallas_tt_eval import pad_cores
    p = mesh.shape[axis]
    d = len(x_cores)
    x_stack, r = pad_cores([np.asarray(c) for c in x_cores])
    r = int(x_stack.shape[1])
    if r % p:
        pad = p - r % p
        x_stack = np.pad(np.asarray(x_stack),
                         ((0, 0), (0, pad), (0, 0), (0, pad)))
        r += pad
    a = max(max(c.shape[0], c.shape[3]) for c in map(np.asarray, A_cores))
    A_stack = np.zeros((d, a, A_cores[0].shape[1], A_cores[0].shape[2], a),
                       x_stack.dtype)
    for k, c in enumerate(map(np.asarray, A_cores)):
        A_stack[k, :c.shape[0], :, :, :c.shape[3]] = c
    rb = max(max(c.shape[0], c.shape[2]) for c in map(np.asarray, b_cores))
    b_stack = np.zeros((d, rb, b_cores[0].shape[1], rb), x_stack.dtype)
    for k, c in enumerate(map(np.asarray, b_cores)):
        b_stack[k, :c.shape[0], :, :c.shape[2]] = c

    mesh_key = (id(mesh), mesh.shape[axis])
    _MESHES[mesh_key] = mesh
    x_true = tuple((int(np.asarray(c).shape[0]), int(np.asarray(c).shape[2]))
                   for c in x_cores)
    fn = make_tp_als_half_sweep(mesh_key, tuple(x_stack.shape),
                                tuple(A_stack.shape), tuple(b_stack.shape),
                                str(x_stack.dtype), axis, int(cg_iters),
                                x_true)
    out = np.asarray(fn(jnp.asarray(x_stack), jnp.asarray(A_stack),
                        jnp.asarray(b_stack)))
    res = []
    for k in range(d):
        rl, n, rr = np.asarray(x_cores[k]).shape
        res.append(jnp.asarray(out[k][:rl, :n, :rr]))
    return res


def _reverse_chain(cores: Sequence, operator: bool = False) -> List:
    """Read a TT chain backwards: reverse the site order and swap each
    core's bond legs.  A LEFT-orthogonal core becomes RIGHT-orthogonal
    under the transpose, so a chain left-orthogonalized up to its last
    site maps to one canonicalized at (new) site 0 — exactly the
    half-sweep kernels' input contract.  This is the serial DMRG driver's
    stack-reversal trick (ops/dmrg_kernels.py) lifted to core lists."""
    if operator:
        return [jnp.transpose(jnp.asarray(c), (3, 1, 2, 0))
                for c in reversed(list(cores))]
    return [jnp.transpose(jnp.asarray(c), (2, 1, 0))
            for c in reversed(list(cores))]


def tp_als_solve(x_cores: Sequence, A_cores: Sequence, b_cores: Sequence,
                 mesh: Mesh, axis: str = "tp", num_half_sweeps: int = 8,
                 cg_iters: int = 64) -> List[jnp.ndarray]:
    """FULL tensor-parallel SPD ALS solve of one system: alternating-
    direction half-sweeps entirely through the sharded kernel, no
    host-side recanonicalization between sweeps (direction alternation is
    chain reversal, `_reverse_chain`).  x must enter canonicalized at
    core 0.  Returns the solution cores in forward site order (core at
    position 0 for even ``num_half_sweeps``, at d-1 for odd).

    This is the multi-sweep convergence path the one-half-sweep oracle
    tests cannot see (env staleness / canonicalization drift across psum
    boundaries accumulates over sweeps); the serial convergence oracle is
    tests/test_parallel.py::test_tp_als_solve_converges_like_serial.
    Reference anchor: the ALS convergence oracles, unitTests/als.cxx:28-61."""
    x = [jnp.asarray(c) for c in x_cores]
    A = [jnp.asarray(c) for c in A_cores]
    b = [jnp.asarray(c) for c in b_cores]
    reversed_state = False
    for _ in range(int(num_half_sweeps)):
        x = tp_als_half_sweep(x, A, b, mesh, axis=axis, cg_iters=cg_iters)
        x = _reverse_chain(x)
        A = _reverse_chain(A, operator=True)
        b = _reverse_chain(b)
        reversed_state = not reversed_state
    if reversed_state:
        x = _reverse_chain(x)
    return x
