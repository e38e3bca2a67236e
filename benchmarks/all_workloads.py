"""All five BASELINE.json workloads, end to end, one JSON line each.

Unlike bench.py (the driver-run TPU kernel benchmark), this exercises the
full object-level API the way a user would; it runs anywhere (CPU or TPU).

  1. TT-SVD + rank-truncated rounding of a dense random order-6 tensor
  2. Indexed einsum chain suite with contraction-order optimization
  3. ALS solve of the d=10 Poisson TTOperator system
  4. Two-site DMRG ground state of the d=32 Heisenberg chain (adaptive rank)
  5. ADF completion + largest-entry search

Usage: python benchmarks/all_workloads.py [--cpu]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> None:
    import xerus_tpu as xe
    from xerus_tpu import Tensor, TTTensor, TTOperator
    from xerus_tpu.examples import laplace_operator, heisenberg_mpo

    xe.set_seed(0xBAADF00D)
    results = []

    # -- workload 1: TT-SVD + rounding of dense order-6 tensor ----------
    t0 = time.perf_counter()
    dense = Tensor.random([8] * 6)
    tt = TTTensor(dense, eps=0.0)
    tt.round(16)
    err = (tt.to_tensor() - dense).frob_norm() / dense.frob_norm()
    results.append({"workload": "ttsvd_round_order6_n8",
                    "seconds": round(time.perf_counter() - t0, 3),
                    "rel_err_at_rank16": f"{err:.3e}",
                    "ranks": tt.ranks()})

    # -- workload 2: indexed einsum chain suite -------------------------
    t0 = time.perf_counter()
    i, j, k, l, m = xe.indices(5)
    B = Tensor.random([40, 30, 20])
    C = Tensor.random([30, 40, 20])
    A = Tensor()
    A(i, j) << B(i, k, l) * C(k, j, l)
    chain = [Tensor.random([30, 30]) for _ in range(8)]
    out = Tensor()
    expr = chain[0](i, j)
    idxs = xe.indices(9)
    expr = chain[0](idxs[0], idxs[1])
    for p in range(1, 8):
        expr = expr * chain[p](idxs[p], idxs[p + 1])
    out(idxs[0], idxs[8]) << expr
    ref = chain[0].to_ndarray()
    for p in range(1, 8):
        ref = ref @ chain[p].to_ndarray()
    ok = bool(np.allclose(out.to_ndarray(), ref, atol=1e-10))
    results.append({"workload": "einsum_chain_suite",
                    "seconds": round(time.perf_counter() - t0, 3),
                    "correct": ok})

    # -- workload 3: d=10 Poisson ALS solve ------------------------------
    t0 = time.perf_counter()
    dims = [2] * 10
    Aop = laplace_operator(dims)
    b = TTTensor.ones(dims)
    x = TTTensor.random(dims, 6)
    resid = xe.ALS_SPD(Aop, x, b, 1e-12)
    results.append({"workload": "als_poisson_d10",
                    "seconds": round(time.perf_counter() - t0, 3),
                    "relative_residual": f"{resid:.3e}",
                    "ranks": x.ranks()})

    # -- workload 4: two-site DMRG Heisenberg ground state (d=32) -------
    t0 = time.perf_counter()
    d = 32
    H = heisenberg_mpo(d)
    g = TTTensor.random([2] * d, 4)
    lam = xe.smallest_eigenvalue(H, g, sites=2, max_rank=16, num_sweeps=6)
    # exact thermodynamic-limit reference: E/N -> 1/4 - ln 2 per bond;
    # finite-chain value differs, so report energy and variance instead
    Hg = xe.apply_operator(H, g)
    var = (Hg - lam * g).frob_norm()
    results.append({"workload": "dmrg_heisenberg_d32",
                    "seconds": round(time.perf_counter() - t0, 3),
                    "ground_energy": round(lam, 8),
                    "eig_residual": f"{var:.3e}",
                    "max_rank": max(g.ranks())})

    # -- workload 5: ADF completion + largest entry ----------------------
    t0 = time.perf_counter()
    dims = [4] * 5
    truth = TTTensor.random(dims, 3)
    truth /= truth.frob_norm()
    ms = xe.SinglePointMeasurementSet.random(400, dims)
    ms.measure(truth)
    xc = TTTensor.random(dims, 1)  # rank-adaptive start (adf.cpp:589-601)
    variant = xe.ADFVariant(400, 1e-8, 0.9999)
    resid = variant(xc, ms, max_ranks=[3] * 4)
    pos = xe.find_largest_entry(xc, accuracy=0.05)
    arr = np.abs(xc.to_tensor().to_ndarray()).reshape(-1)
    results.append({"workload": "adf_completion_largest_entry",
                    "seconds": round(time.perf_counter() - t0, 3),
                    "sample_residual": f"{resid:.3e}",
                    "recovery_err_vs_truth": f"{ms.test(xc):.3e}",
                    "found_entry_frac_of_max": round(
                        float(arr[pos] / arr.max()), 4)})

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
