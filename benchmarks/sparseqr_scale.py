#!/usr/bin/env python
"""Scale boundary of the native row-Givens sparse QR (VERDICT r3 #7).

The reference wraps SuiteSparseQR — a supernodal multifrontal factorizer
(cholmod_wrapper.h:44-100).  native/sparseqr.cpp is a George-Heath
row-Givens QR: correct, rank-revealing, but not the supernodal
performance class; its cost is driven by R fill-in, which for matrices
with DENSE-ish random sparsity grows like the dense QR's.  This driver
measures where it loses to the dense-LAPACK fallback (the path callers
take when the native library is absent, core/factorizations.py) so the
accepted debt has a number attached.

Sweeps m x n = 2n x n over n and nnz/row; per cell reports native wall,
dense wall (numpy f64 QR of the densified matrix + re-sparsify), Q/R
fill-in, and a reconstruction check ||QC - A|| / ||A||.

Usage: python benchmarks/sparseqr_scale.py [--max-n N] [--budget SECS]
Writes a markdown table to stdout and benchmarks/sparseqr_scale.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np

from xerus_tpu.core import sparse_qr as sq


def _parse_int(flag: str, default: int) -> int:
    for k, a in enumerate(sys.argv):
        if a == flag and k + 1 < len(sys.argv):
            return int(sys.argv[k + 1])
        if a.startswith(flag + "="):
            return int(a.split("=", 1)[1])
    return default


def make_instance(rng, m, n, nnz_per_row, pattern="random"):
    """Sparse m x n with ~nnz_per_row entries/row.  'random' scatters
    columns uniformly (worst case for Givens fill-in); 'banded' keeps
    every row's entries within a bandwidth-nnz_per_row window around the
    diagonal (the structured regime TT sparse cores actually live in —
    Laplace/shift/dirac operators, sparseTensor.cxx)."""
    rows = np.repeat(np.arange(m), nnz_per_row)
    if pattern == "banded":
        base = (np.repeat(np.arange(m), nnz_per_row) * n) // m
        off = rng.integers(0, max(nnz_per_row, 2), size=rows.size)
        cols = np.minimum(base + off, n - 1)
    else:
        cols = rng.integers(0, n, size=rows.size)
    pos = rows * n + cols
    # dedupe (collisions make duplicate COO entries, which the native
    # layer sums; keep the instance simple instead)
    pos = np.unique(pos)
    vals = rng.standard_normal(pos.size)
    return pos, vals


def dense_qc(pos, vals, m, n):
    A = np.zeros((m, n))
    A[pos // n, pos % n] = vals
    q, r = np.linalg.qr(A)
    return q, r


def main() -> None:
    max_n = _parse_int("--max-n", 4096)
    budget = float(_parse_int("--budget", 120))
    assert sq.native_available(), "native sparse QR failed to build"
    rng = np.random.default_rng(0xC0FFEE)

    rows = []
    print("| pattern | n (m=2n) | nnz/row | native_s | dense_s | "
          "native/dense | fill(Q) | fill(C) | rel_rec |")
    print("|---|---|---|---|---|---|---|---|---|")
    stop_at = {"random": max_n, "banded": max_n}
    for pattern, n in [(p, n)
                       for p in ("random", "banded")
                       for n in (256, 512, 1024, 2048, 4096, 8192)]:
        if n > stop_at[pattern]:
            continue
        m = 2 * n
        for nnz_row in (2, 8, 32):
            pos, vals = make_instance(rng, m, n, nnz_row, pattern)
            t0 = time.perf_counter()
            out = sq.sparse_qc(pos, vals, m, n, 0.0)
            t_nat = time.perf_counter() - t0
            q_flat, c_flat, rank = out
            t0 = time.perf_counter()
            dense_qc(pos, vals, m, n)
            t_dense = time.perf_counter() - t0
            # reconstruction check on a random probe vector (O(nnz))
            xprobe = rng.standard_normal(n)
            cx = np.zeros(rank)
            for p, v in c_flat.items():
                cx[p // n] += v * xprobe[p % n]
            qcx = np.zeros(m)
            for p, v in q_flat.items():
                qcx[p // rank] += v * cx[p % rank]
            ax = np.zeros(m)
            np.add.at(ax, pos // n, vals * xprobe[pos % n])
            rel = (np.linalg.norm(qcx - ax)
                   / (np.linalg.norm(ax) + 1e-300))
            row = {"pattern": pattern, "n": n, "m": m,
                   "nnz_per_row": nnz_row,
                   "nnz": int(pos.size), "rank": rank,
                   "native_s": round(t_nat, 4),
                   "dense_s": round(t_dense, 4),
                   "native_over_dense": round(t_nat / t_dense, 2),
                   "fill_q": round(len(q_flat) / pos.size, 1),
                   "fill_c": round(len(c_flat) / pos.size, 1),
                   "rel_reconstruction": f"{rel:.2e}"}
            rows.append(row)
            print(f"| {pattern} | {n} | {nnz_row} | {t_nat:.3f} | "
                  f"{t_dense:.3f} | {t_nat / t_dense:.2f} | "
                  f"{row['fill_q']} | {row['fill_c']} | {rel:.1e} |",
                  flush=True)
            assert rel < 1e-10, (pattern, n, nnz_row, rel)
            # write incrementally: a killed run keeps its finished rows
            with open(os.path.join(_REPO, "benchmarks",
                                   "sparseqr_scale.json"), "w") as f:
                json.dump(rows, f, indent=1)
            if t_nat > budget:
                print(f"... {pattern}: stopping, native wall "
                      f"{t_nat:.0f}s > budget at n={n}", flush=True)
                stop_at[pattern] = n  # skip larger sizes, this pattern
                break

if __name__ == "__main__":
    main()
