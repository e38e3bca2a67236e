"""Double-word symmetric eigendecomposition: f32 eigh + Ogita-Aishima
refinement with Ozaki GEMMs.

Completes the df precision stack (ops/df32.py, ops/ozaki.py,
ops/df_cholesky.py): given a symmetric df matrix, an f32 `eigh` seeds
approximate eigenvectors, then each refinement iteration (Ogita & Aishima,
"Iterative refinement for symmetric eigenvalue decomposition", JSIAM 2018)
computes

    R = I - V^T V,   S = V^T A V        (df-accurate Ozaki GEMMs)
    lambda_i = S_ii / (V^T V)_ii        (refined Rayleigh quotients)
    E_ij = (S_ij + lambda_j R_ij) / (lambda_j - lambda_i),  E_ii = R_ii / 2
    V <- V + V E                        (Ozaki GEMM, df accumulate)

E is O(u) small, so computing it in f32 costs only O(u^2) = O(2^-48) in the
result; convergence is quadratic while eigenvalue gaps exceed the current
error.  Clustered eigenvalues cap the attainable accuracy at
~u_df / gap — returned as is (document, don't hide).

The reference's analogue is LAPACK dsyev via blasLapackWrapper; this is
the TPU-native f64-quality version (TPU has no practical f64).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .df32 import df_add, df_sub
from .ozaki import ozaki_matmul


def df_eigh(Ah: jnp.ndarray, Al: jnp.ndarray, iters: int = 6):
    """Symmetric df eigendecomposition.  Returns (wh, wl, Vh, Vl) with
    eigenvalues ascending (f32-eigh order preserved)."""
    n = Ah.shape[0]
    dtype = Ah.dtype
    w0, V0 = jnp.linalg.eigh(Ah)
    Vh, Vl = V0, jnp.zeros_like(V0)
    lam_h, lam_l = w0, jnp.zeros_like(w0)
    eye = jnp.eye(n, dtype=dtype)

    for _ in range(iters):
        # Gram and Rayleigh matrices at df accuracy
        Gh, Gl = ozaki_matmul(jnp.transpose(Vh), jnp.transpose(Vl), Vh, Vl)
        AVh, AVl = ozaki_matmul(Ah, Al, Vh, Vl)
        Sh, Sl = ozaki_matmul(jnp.transpose(Vh), jnp.transpose(Vl), AVh, AVl)
        Rh, Rl = df_sub(eye, jnp.zeros_like(eye), Gh, Gl)
        # refined Rayleigh quotients (df diagonal ratio; G_ii ~ 1)
        gd_h = jnp.diagonal(Gh)
        gd_l = jnp.diagonal(Gl)
        sd_h = jnp.diagonal(Sh)
        sd_l = jnp.diagonal(Sl)
        from .mixed_precision import df_div
        lam_h, lam_l = df_div(sd_h, sd_l, gd_h, gd_l)
        # correction E in f32: it is O(u)-small, so f32 costs O(u^2)
        lam = lam_h + lam_l
        denom = lam[None, :] - lam[:, None]
        # truly degenerate pairs (gap at the df noise floor of the GLOBAL
        # spectral scale) get the orthogonality-only correction R/2 — any
        # orthonormal basis of a degenerate cluster is fine; everything
        # else takes the full Ogita-Aishima step, trust-clipped so a
        # marginal gap can't blow the linearization up (it then converges
        # over extra iterations instead)
        scale = jnp.max(jnp.abs(lam)) + 1e-30
        tiny_gap = jnp.abs(denom) <= 1e-8 * scale
        safe = jnp.where(tiny_gap, 1.0, denom)
        E_full = (Sh + Sl + lam[None, :] * (Rh + Rl)) / safe
        E = jnp.where(tiny_gap, (Rh + Rl) / 2.0, E_full)
        E = jnp.clip(E, -0.25, 0.25)
        # diagonal: exactly R_ii/2 (tiny_gap always includes the diagonal,
        # so zero it out of the off-diagonal branch first)
        offdiag = 1.0 - eye
        E = E * offdiag + jnp.diag(jnp.diagonal(Rh + Rl) / 2.0)
        # divergence gate: a healthy OA state has ||R|| << 1; if an
        # out-of-contract spectrum (heavily clustered tail) pumps the
        # state up instead, freeze rather than iterate into NaN
        rnorm = jnp.sqrt(jnp.sum((Rh + Rl) ** 2))
        gate = (rnorm < 0.5).astype(dtype)
        dVh, dVl = ozaki_matmul(Vh, Vl, E, jnp.zeros_like(E))
        Vh, Vl = df_add(Vh, Vl, dVh * gate, dVl * gate)
    return lam_h, lam_l, Vh, Vl


@lru_cache(maxsize=16)
def make_df_eigh(n: int, dtype_str: str, iters: int = 6):
    from .tt_kernels import jit_f32
    return jit_f32(partial(df_eigh, iters=iters), dtype_str)


def df_svd(Ah: jnp.ndarray, Al: jnp.ndarray, iters: int = 6):
    """Thin df SVD of an (m, n) df matrix, m >= n, via the Gram route:
    G = A^T A (Ozaki GEMM) -> df_eigh -> sigma = sqrt(eigenvalues),
    U = A V / sigma.  Gram squaring halves the attainable relative
    accuracy of SMALL singular values (sigma_i below ~2^-24 * sigma_max
    come back at f32 quality; the dominant spectrum is df-accurate) —
    same trade as the 'gram' rounding kernel.  Returns
    (Uh, Ul, sh, sl, Vh, Vl) with singular values DESCENDING."""
    from .mixed_precision import df_sqrt, df_div
    m, n = Ah.shape
    Gh, Gl = ozaki_matmul(jnp.transpose(Ah), jnp.transpose(Al), Ah, Al)
    wh, wl, Vh, Vl = df_eigh(Gh, Gl, iters=iters)
    # descending order
    order = jnp.argsort(-wh)
    wh = jnp.take(wh, order)
    wl = jnp.take(wl, order)
    Vh = jnp.take(Vh, order, axis=1)
    Vl = jnp.take(Vl, order, axis=1)
    sh, sl = df_sqrt(jnp.maximum(wh, 0.0), jnp.where(wh > 0, wl, 0.0))
    AVh, AVl = ozaki_matmul(Ah, Al, Vh, Vl)
    # sigma below the Gram noise floor (~2^-24 * sigma_max) cannot be
    # inverted meaningfully: zero those directions instead.  NOTE: divide
    # DIRECTLY rather than multiplying by a df reciprocal — under one jit
    # XLA folds reciprocal-then-multiply back into a single f32 divide and
    # the double-word accuracy silently drops to 2^-24
    tiny = 6e-8 * jnp.max(sh) + jnp.asarray(1e-30, Ah.dtype)
    dead = (sh <= tiny).astype(Ah.dtype)
    Uh, Ul = df_div(AVh, AVl,
                    jnp.maximum(sh, tiny)[None, :],
                    jnp.where(sh > tiny, sl, 0.0)[None, :])
    Uh = Uh * (1.0 - dead)[None, :]
    Ul = Ul * (1.0 - dead)[None, :]
    # renormalize U columns: exact arithmetic gives unit columns, so this
    # only absorbs sigma estimation error — it keeps U bounded even where
    # sigma_i sits at the Gram noise floor (~2^-24 * sigma_max, where the
    # Gram route's accuracy ends; see docstring)
    cn = jnp.sqrt(jnp.sum((Uh + Ul) ** 2, axis=0))
    sick = jnp.abs(cn - 1.0) > 1e-4          # healthy columns stay exact df
    cinv = jnp.where(cn > 1e-30, 1.0 / jnp.maximum(cn, 1e-30), 0.0)
    factor = jnp.where(sick, cinv, 1.0)
    Uh = Uh * factor[None, :]
    Ul = Ul * factor[None, :]
    return Uh, Ul, sh, sl, Vh, Vl
