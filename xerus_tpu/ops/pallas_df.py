"""Pallas TPU kernel: double-word f32 matvec in one HBM pass.

The jnp df_matvec (ops/df32.py) materializes the (m, k) product pair and
tree-reduces it in log2(k) passes over HBM.  This kernel tiles the rows,
keeps a df accumulator pair in VMEM, and walks k in chunks with compensated
(TwoProd + TwoSum) accumulation — one read of A, no intermediate traffic.
Used by the df iterative-refinement solves for large local systems.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


_MASK12 = ~((1 << 12) - 1)


def _mask_split(a):
    # exact 12/12 mantissa split by bit masking — the arithmetic Veltkamp
    # split (c = a*4097; hi = c - (c - a)) is destroyed by FMA contraction
    # under compilation (see ops/df32._split), the mask is contraction-proof
    hi = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(a, jnp.int32) & jnp.int32(_MASK12),
        jnp.float32)
    return hi, a - hi


def _two_prod(a, b):
    # EFT-sum of four exact half-products; see ops/df32.two_prod for why
    # the classic (p = a*b; err = ah*bh - p + ...) form is NOT safe under
    # compilation (FMA contraction of a consumer `p + x`)
    ah, al = _mask_split(a)
    bh, bl = _mask_split(b)
    s, e1 = _two_sum(ah * bl, al * bh)
    p, e2 = _two_sum(ah * bh, s)
    return p, e1 + e2 + al * bl


def _fast_two_sum(a, b):
    s = a + b
    return s, b - (s - a)


def _df_add(xh, xl, yh, yl):
    s, e = _two_sum(xh, yh)
    return _fast_two_sum(s, e + (xl + yl))


def _df_matvec_kernel(ah_ref, al_ref, xh_ref, xl_ref, oh_ref, ol_ref, *,
                      block_k: int, k_total: int):
    """One grid step: (block_m, k) rows x (1, k) vector -> (block_m, 1) df.
    Everything stays 2-D — current Mosaic rejects 1-D vector loads/stores
    (vector.load memref<...xf32> -> vector<256xf32> verification error)."""
    acc_h = jnp.zeros((ah_ref.shape[0], 1), jnp.float32)
    acc_l = jnp.zeros_like(acc_h)
    num_chunks = k_total // block_k

    def body(c, carry):
        acc_h, acc_l = carry
        sl = pl.ds(c * block_k, block_k)
        a_h = ah_ref[:, sl]
        a_l = al_ref[:, sl]
        v_h = xh_ref[:, sl]          # (1, block_k)
        v_l = xl_ref[:, sl]
        # df products for the chunk: (block_m, block_k), renormalized
        p_h, p_e = _two_prod(a_h, v_h)
        ch, cl = _fast_two_sum(p_h, p_e + (a_h * v_l + a_l * v_h))
        # pairwise-tree reduce the chunk (renormalizing df adds)
        width = block_k
        while width > 1:
            half = width // 2
            ch, cl = _df_add(ch[:, :half], cl[:, :half],
                             ch[:, half:width], cl[:, half:width])
            width = half
        acc_h, acc_l = _df_add(acc_h, acc_l, ch[:, :1], cl[:, :1])
        return acc_h, acc_l

    acc_h, acc_l = jax.lax.fori_loop(0, num_chunks, body, (acc_h, acc_l))
    oh_ref[:, :] = acc_h
    ol_ref[:, :] = acc_l


@lru_cache(maxsize=32)
def _build(m: int, k: int, block_m: int, block_k: int, interpret: bool):
    kernel = partial(_df_matvec_kernel, block_k=block_k, k_total=k)
    return jax.jit(pl.pallas_call(
        kernel,
        grid=(m // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i: (i, 0)),
            pl.BlockSpec((block_m, k), lambda i: (i, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_m, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((m, 1), jnp.float32),
                   jax.ShapeDtypeStruct((m, 1), jnp.float32)],
        interpret=interpret,
    ))


def pallas_df_matvec(Ah, Al, xh, xl, block_m: int = 128, block_k: int = 256,
                     interpret: bool = None):
    """df (m,k) @ df (k,) -> df (m,) in one HBM pass; pads to block sizes."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    m, k = Ah.shape
    pad_m = (-m) % block_m
    pad_k = (-k) % block_k
    if pad_m or pad_k:
        Ah = jnp.pad(Ah, ((0, pad_m), (0, pad_k)))
        Al = jnp.pad(Al, ((0, pad_m), (0, pad_k)))
        xh = jnp.pad(xh, (0, pad_k))
        xl = jnp.pad(xl, (0, pad_k))
    # NEVER trace this kernel under jax x64: the fori_loop index comes out
    # i64 and Mosaic either rejects the mixed-width muli or recurses
    # forever in its convert_element_type lowering.  Callers inside jits
    # must trace under jit_f32 (x64 off); this guard covers eager use.
    with jax.enable_x64(False):
        fn = _build(m + pad_m, k + pad_k, block_m, block_k, bool(interpret))
        oh, ol = fn(Ah, Al, xh[None, :], xl[None, :])
    return oh[:m, 0], ol[:m, 0]
