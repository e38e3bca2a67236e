#!/usr/bin/env python
"""Fill-reducing preorder study for the native sparse QR (VERDICT r4 #7).

Measures the random-scatter regime (the accepted SPQR debt,
doc/performance.md) under the three orderings of native/sparseqr.cpp:
0 natural, 1 ascending column count, 2 greedy min-degree on A^T A.
Also reports the densify+LAPACK wall for context.  Writes
benchmarks/sparseqr_ordering.json.
"""
from __future__ import annotations

import json, os, sys, time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np
from xerus_tpu.core import sparse_qr as sq


def make_random(rng, m, n, nnz_row):
    rows = np.repeat(np.arange(m), nnz_row)
    cols = rng.integers(0, n, size=rows.size)
    pos = np.unique(rows * n + cols)
    return pos, rng.standard_normal(pos.size)


def main():
    assert sq.native_available()
    rng = np.random.default_rng(0xC0FFEE)
    rows_out = []
    print("| n | nnz/row | dense_s | ord0_s | ord1_s | ord2_s | "
          "fillQ 0/1/2 |", flush=True)
    cases = [(256, 2), (256, 8), (256, 32), (512, 2), (512, 8),
             (1024, 2), (1024, 8)]
    for n, nnz_row in cases:
        m = 2 * n
        pos, vals = make_random(rng, m, n, nnz_row)
        A = np.zeros((m, n)); A[pos // n, pos % n] = vals
        t0 = time.perf_counter(); np.linalg.qr(A)
        t_dense = time.perf_counter() - t0
        walls, fills = {}, {}
        for o in (0, 1, 2):
            t0 = time.perf_counter()
            out = sq.sparse_qc(pos, vals, m, n, 0.0, ordering=o)
            walls[o] = time.perf_counter() - t0
            q_flat, c_flat, rank = out
            fills[o] = round(len(q_flat) / pos.size, 1)
            # probe reconstruction
            x = rng.standard_normal(n)
            cx = np.zeros(rank)
            for p, v in c_flat.items():
                cx[p // n] += v * x[p % n]
            qcx = np.zeros(m)
            for p, v in q_flat.items():
                qcx[p // rank] += v * cx[p % rank]
            ax = np.zeros(m)
            np.add.at(ax, pos // n, vals * x[pos % n])
            rel = np.linalg.norm(qcx - ax) / (np.linalg.norm(ax) + 1e-300)
            assert rel < 1e-10, (n, nnz_row, o, rel)
        row = {"n": n, "nnz_per_row": nnz_row, "nnz": int(pos.size),
               "dense_s": round(t_dense, 4),
               **{f"ord{o}_s": round(walls[o], 4) for o in (0, 1, 2)},
               **{f"ord{o}_fill_q": fills[o] for o in (0, 1, 2)},
               **{f"ord{o}_over_dense": round(walls[o] / t_dense, 2)
                  for o in (0, 1, 2)}}
        rows_out.append(row)
        print(f"| {n} | {nnz_row} | {t_dense:.3f} | {walls[0]:.3f} | "
              f"{walls[1]:.3f} | {walls[2]:.3f} | "
              f"{fills[0]}/{fills[1]}/{fills[2]} |", flush=True)
        with open(os.path.join(_REPO, "benchmarks",
                               "sparseqr_ordering.json"), "w") as f:
            json.dump(rows_out, f, indent=1)


if __name__ == "__main__":
    main()
