"""Rank-sharded multi-chip TT rounding (TSQR + Gram-eigh truncation).

The serial scan kernels (ops/tt_kernels.py) run the whole sweep on one
chip.  This module distributes the RANK axis of every core over a mesh
axis, in the spirit of Al Daas/Ballard-style parallel TT arithmetic
(parallel dense linear algebra per site, sequential over the d sites):

- orthogonalization pass: each site's tall-skinny QR of the (r*n, r)
  unfolding becomes a TSQR — local QR on the row block, `all_gather` of
  the p small (r, r) R factors, one replicated QR of the stacked R's,
  local Q update.  Carry R stays replicated; applying it to the next
  (rank-sharded) core is a partial GEMM + `psum_scatter`.
- truncation pass: per site, the Gram matrix of the (r, n*r) unfolding is
  a column-block GEMM + `psum`; the replicated (r, r) eigh picks the kept
  spectrum (pad-to-max-rank mask, identical semantics to
  `_round_sweep_scan_gram`); the projection is local on the column block.
- one `all_to_all` between the passes reshards the stack from
  left-rank-sharded to right-rank-sharded.

All collectives are rank-sized (r*r or r*n*r/p) and ride ICI; the per-site
GEMM work drops by ~p per chip.  Validated against the serial kernel on
the 8-virtual-device CPU mesh (tests/test_parallel.py).

The reference rounds single-node only (xerus tensorNetwork.cpp round_edge /
ttNetwork.cpp:1100-1200 move_core sweeps); this is the TPU-native
multi-chip extension.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def _round_tsqr_local(stacked, target_rank: int, p: int, axis: str,
                      method: str = "gram"):
    """Body run per device under shard_map.  stacked: (d, r/p, n, r) local
    block, sharded on the LEFT rank axis.  method='gram' truncates each
    bond with a replicated (r, r) eigh; method='subspace' replaces it
    with GEMM-only subspace iteration + Cholesky LQ (no eigh anywhere —
    v5e eigh(256) costs ~2ms per CALL and does not batch, see
    ops/tt_kernels._trunc_step_subspace; quality within a few % of
    exact truncation, validated on the CPU mesh)."""
    d, rp, n, r = stacked.shape
    dtype = stacked.dtype
    tiny = jnp.asarray(1e-30, dtype)
    i = jax.lax.axis_index(axis)

    # ---- pass 1: left->right TSQR orthogonalization ----
    def qr_body(carry, core_local):
        R, logs = carry                            # R replicated (r, r)
        Rcols = jax.lax.dynamic_slice_in_dim(R, i * rp, rp, axis=1)
        partial_full = jnp.einsum("ab,bnc->anc", Rcols, core_local,
                                  preferred_element_type=dtype)
        cur = jax.lax.psum_scatter(partial_full, axis, scatter_dimension=0,
                                   tiled=True)     # (r/p, n, r)
        q1, r1 = jnp.linalg.qr(cur.reshape(rp * n, r))
        k1 = r1.shape[0]                           # min(r/p * n, r)
        rs = jax.lax.all_gather(r1, axis)          # (p, k1, r)
        q2, R2 = jnp.linalg.qr(rs.reshape(p * k1, r))
        qblock = jax.lax.dynamic_slice_in_dim(q2, i * k1, k1, axis=0)
        q = q1 @ qblock                            # (rp*n, min(p*k1, r))
        if q.shape[1] < r:                         # wide local blocks
            q = jnp.pad(q, ((0, 0), (0, r - q.shape[1])))
            R2 = jnp.pad(R2, ((0, r - R2.shape[0]), (0, 0)))
        q = q.reshape(rp, n, r)
        nrm = jnp.linalg.norm(R2) + tiny
        return (R2 / nrm, logs + jnp.log(nrm)), q

    eye = jnp.eye(r, dtype=dtype)
    (Rlast, logs), qs = jax.lax.scan(qr_body, (eye, jnp.zeros((), dtype)),
                                     stacked)
    qs = qs.at[d - 1].set(jnp.einsum("anb,bc->anc", qs[d - 1], Rlast))

    # ---- reshard: left-rank-sharded -> right-rank-sharded ----
    qs = jax.lax.all_to_all(qs, axis, split_axis=3, concat_axis=1,
                            tiled=True)            # (d, r, n, r/p)

    # ---- pass 2: right->left truncation (gram-eigh or subspace) ----
    mask = (jnp.arange(r, dtype=jnp.int32) < target_rank).astype(dtype)

    def _truncate(curm):
        """curm: (r, n*r/p) local column block.  Returns (US2 (r, r,
        masked), vt (r, n*rp) local block)."""
        G = jax.lax.psum(curm @ curm.T, axis)      # (r, r) replicated
        if method == "subspace":
            from jax.scipy.linalg import solve_triangular
            from ..ops.tt_kernels import chol_orth_cols
            eps_s = jnp.asarray(10 * jnp.finfo(dtype).eps, dtype)
            eye = jnp.eye(r, dtype=dtype)
            # inputs replicated across the shard_map axis, so the
            # shared column orthonormalizer applies unchanged
            orth_cols = chol_orth_cols

            V = orth_cols(G * mask[None, :])
            for _ in range(3):
                V = orth_cols((G @ V) * mask[None, :])
            V = orth_cols(V) * mask[None, :]
            vt_loc = V.T @ curm                    # (r, n*rp) local
            Gr = jax.lax.psum(vt_loc @ vt_loc.T, axis)
            shift = eps_s * jnp.max(jnp.diagonal(Gr)) + tiny
            L = jnp.linalg.cholesky(Gr + shift * eye)
            vt = solve_triangular(L, vt_loc, lower=True) * mask[:, None]
            US2 = (V @ L) * mask[None, :]
            return US2, vt
        lam, V = jnp.linalg.eigh(G)
        lam = lam[::-1]
        V = V[:, ::-1]
        s = jnp.sqrt(jnp.maximum(lam, 0.0)) * mask
        inv_s = jnp.where(s > tiny, 1.0 / jnp.maximum(s, tiny), 0.0)
        vt = (V.T @ curm) * inv_s[:, None]
        return V * s[None, :], vt

    def gram_body(carry, core_local):
        US, logs = carry                           # replicated (r, r)
        USrows = jax.lax.dynamic_slice_in_dim(US, i * rp, rp, axis=0)
        partial_full = jnp.einsum("anb,bc->anc", core_local, USrows,
                                  preferred_element_type=dtype)
        cur = jax.lax.psum_scatter(partial_full, axis, scatter_dimension=2,
                                   tiled=True)     # (r, n, r/p)
        curm = cur.reshape(r, n * rp)
        US2, vt = _truncate(curm)
        nrm = jnp.linalg.norm(US2) + tiny
        return (US2 / nrm, logs + jnp.log(nrm)), vt.reshape(r, n, rp)

    (USfinal, logs2), new_rest = jax.lax.scan(
        gram_body, (eye, jnp.zeros((), dtype)), qs[1:][::-1])
    USrows = jax.lax.dynamic_slice_in_dim(USfinal, i * rp, rp, axis=0)
    first_partial = jnp.einsum("anb,bc->anc", qs[0], USrows,
                               preferred_element_type=dtype)
    first = jax.lax.psum_scatter(first_partial, axis, scatter_dimension=2,
                                 tiled=True)
    out = jnp.concatenate([first[None], new_rest[::-1]], axis=0)
    return out * jnp.exp((logs + logs2) / d)


@lru_cache(maxsize=16)
def make_round_tsqr(mesh_key, shape, target_rank: int, dtype_str: str,
                    axis: str, method: str = "gram"):
    mesh = _MESHES[mesh_key]
    p = mesh.shape[axis]
    fn = shard_map(
        partial(_round_tsqr_local, target_rank=target_rank, p=p, axis=axis,
                method=method),
        mesh=mesh,
        in_specs=P(None, axis, None, None),
        out_specs=P(None, None, None, axis),
        check_vma=False)
    return jax.jit(fn)


_MESHES = {}


def tt_round_tsqr(cores: Sequence[jnp.ndarray], target_rank: int,
                  mesh: Mesh, axis: str = "tp", method: str = "gram"):
    """Round a TT (list of (rl, n, rr) cores) to `target_rank` with the
    rank axis sharded over `mesh.shape[axis]` devices.  Pads the uniform
    rank to a multiple of the device count; returns unpadded cores.
    method: 'gram' (replicated per-bond eigh) or 'subspace' (GEMM-only
    truncation — no eigh; see _round_tsqr_local)."""
    from ..ops.pallas_tt_eval import pad_cores
    from ..ops.tt_kernels import res_rank
    p = mesh.shape[axis]
    stacked, r = pad_cores([np.asarray(c) for c in cores])
    r = int(stacked.shape[1])
    if r % p:
        pad = p - r % p
        stacked = np.pad(np.asarray(stacked),
                         ((0, 0), (0, pad), (0, 0), (0, pad)))
        r += pad
    d, n = stacked.shape[0], stacked.shape[2]
    mesh_key = (id(mesh), mesh.shape[axis])
    _MESHES[mesh_key] = mesh
    fn = make_round_tsqr(mesh_key, tuple(stacked.shape), int(target_rank),
                         str(stacked.dtype), axis, method)
    out = np.asarray(fn(jnp.asarray(stacked)))
    res = []
    for k in range(d):
        rl = 1 if k == 0 else res_rank(k, d, n, target_rank)
        rr = 1 if k == d - 1 else res_rank(k + 1, d, n, target_rank)
        res.append(jnp.asarray(out[k][:rl, :cores[k].shape[1], :rr]))
    return res
