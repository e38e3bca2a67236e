"""Pallas TPU kernel: evaluate a TT at M index tuples in one fused kernel.

This is the hot inner loop of ADF/IHT/measurement tests (the reference runs
it as numMeasurments small GEMVs with OpenMP + stack dedup,
src/xerus/algorithms/adf.cpp:255-313, src/xerus/measurments.cpp:470-500).
The XLA fallback (algorithms/measurements.py) performs one gather + batched
matmul per site, writing the (M, r) frontier to HBM between sites; this
kernel keeps the frontier in VMEM across all sites and turns the gather into
a one-hot matmul (MXU/VPU-friendly — TPUs hate scattered loads).

Cores must be padded to a uniform (d, r, n, r) stack; boundary cores are
zero-padded, the frontier starts at basis vector e_0 and the result is read
from lane 0.  See pad_cores().
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def pad_cores(cores: Sequence) -> Tuple[jnp.ndarray, int]:
    """Stack TT cores into a uniform (d, r, n, r) array (zero-padded)."""
    d = len(cores)
    r = max(max(c.shape[0], c.shape[2]) for c in cores)
    n = max(c.shape[1] for c in cores)
    out = np.zeros((d, r, n, r), dtype=np.asarray(cores[0]).dtype)
    for k, c in enumerate(cores):
        c = np.asarray(c)
        out[k, :c.shape[0], :c.shape[1], :c.shape[2]] = c
    return jnp.asarray(out), r


def _tt_eval_kernel(idx_ref, cores_ref, out_ref, *, d: int, r: int, n: int,
                    block_m: int):
    """One grid step: evaluate block_m measurements through all d sites.

    Everything stays strictly 2-D with STATIC slices — the current Mosaic
    rejects both 1-D vector stores and in-kernel 3-D<->2-D shape casts on
    non-native tiles ('infer-vector-layout: unsupported shape cast').
    Cores arrive pre-flattened as (d, n, r*r)."""
    # frontier F: (block_m, r), starts at e_0
    lane = jax.lax.broadcasted_iota(jnp.int32, (block_m, r), 1)
    F = jnp.where(lane == 0, 1.0, 0.0).astype(out_ref.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (block_m, n), 1)
    for k in range(d):  # static unroll: one one-hot matmul + contraction/site
        idx_k = idx_ref[:, k]                            # (block_m,)
        onehot = jnp.where(col == idx_k[:, None], 1.0, 0.0).astype(out_ref.dtype)
        taken = jnp.dot(onehot, cores_ref[k],
                        preferred_element_type=out_ref.dtype)  # (bm, r*r)
        # F_new[:, j] = sum_i F[:, i] * taken[:, i*r + j]; static 2-D slices
        Fn = F[:, 0:1] * taken[:, 0:r]
        for i in range(1, r):
            Fn = Fn + F[:, i:i + 1] * taken[:, i * r:(i + 1) * r]
        F = Fn
    out_ref[:, :] = F[:, :128]


@lru_cache(maxsize=32)
def _build(d: int, r: int, n: int, m_total: int, block_m: int, dtype_str: str,
           interpret: bool):
    dtype = jnp.dtype(dtype_str)
    grid = (m_total // block_m,)
    kernel = partial(_tt_eval_kernel, d=d, r=r, n=n, block_m=block_m)
    fn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, 128), lambda i: (i, 0)),
            pl.BlockSpec((d, n, r * r), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_total, 128), dtype),
        interpret=interpret,
    )
    return jax.jit(fn)


def tt_eval_at_points_pallas(cores: Sequence, positions: np.ndarray,
                             block_m: int = 256,
                             interpret: bool = None) -> jnp.ndarray:
    """values[m] = TT[positions[m]] — fused Pallas sweep.

    Falls back to interpret mode off-TPU (tests run on CPU)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    stacked, r = pad_cores([np.asarray(c) for c in cores])
    d = stacked.shape[0]
    n = stacked.shape[2]
    M = positions.shape[0]
    pad_m = (-M) % block_m
    # the index block's minor dim is padded to a full 128-lane tile —
    # narrow int32 blocks trip the same Mosaic bounds check
    idx = np.zeros((M + pad_m, 128), dtype=np.int32)
    idx[:M, :d] = positions
    out_dtype = stacked.dtype
    # ranks beyond 128 lanes fall back to the XLA gather+matmul path
    if r > 128:
        F = jnp.zeros((M, int(r)), stacked.dtype).at[:, 0].set(1.0)
        pos = jnp.asarray(np.asarray(positions, np.int32))
        for k in range(d):
            Ck = jnp.transpose(stacked[k], (1, 0, 2))    # (n, r, r)
            taken = jnp.take(Ck, pos[:, k], axis=0)      # (M, r, r)
            F = jnp.einsum("mi,mij->mj", F, taken)
        return F[:, 0]
    # Mosaic wants 128-lane minor dims: always pad the rank to 128 (the
    # one-hot dot and frontier updates then sit on native (8,128) tiles)
    r_pad = 128
    if int(r) != r_pad:
        pad_cfg = ((0, 0), (0, r_pad - int(r)), (0, 0), (0, r_pad - int(r)))
        stacked = jnp.pad(stacked, pad_cfg)
    flat = jnp.transpose(stacked, (0, 2, 1, 3)).reshape(d, n, r_pad * r_pad)
    if interpret:
        fn = _build(d, r_pad, int(n), M + pad_m, block_m,
                    str(flat.dtype), True)
        out = fn(jnp.asarray(idx), flat)
        return out[:M, 0]
    # real TPU: never trace Pallas under jax x64 (s64 indices crash the
    # current Mosaic — see ops/pallas_df.py), and f64 is unusable there
    # anyway — run the kernel in f32
    if flat.dtype == jnp.float64:
        flat = flat.astype(jnp.float32)
    with jax.enable_x64(False):
        fn = _build(d, r_pad, int(n), M + pad_m, block_m,
                    str(flat.dtype), False)
        out = fn(jnp.asarray(idx), flat)
    return out[:M, 0].astype(out_dtype)
