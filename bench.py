"""Benchmark driver: prints ONE JSON line.

Workloads (BASELINE.md / BASELINE.json):
  1. TT-rounding of a d=32, n=2, rank-256 TT to rank 128 — the north-star
     TFLOP/s metric (deterministic QR+SVD chain, ops/tt_kernels.py), plus
     the GEMM-dominated randomized variant.
  2. ALS half-sweep time on the d=32 QTT Poisson system at rank 30.

Timing methodology: the TPU here sits behind a tunnel with ~150ms dispatch
RTT and an unreliable block_until_ready, so each kernel is run ITERS times
chained INSIDE one XLA program (serial data dependency, no CSE) and the
whole program is synchronized by fetching one scalar; per-iteration time is
(total - single_iter_total) / (ITERS - 1), which cancels the RTT.

``vs_baseline`` is the wall-clock speedup of the TPU deterministic rounding
sweep over the same float64 sweep in numpy/LAPACK on the host CPU — the
kernel chain the reference (xerus + OpenBLAS) executes for this workload
(blasLapackWrapper.cpp qr/svd; the reference publishes no absolute numbers,
BASELINE.md).  TPU compute is float32 (f64 is emulated on TPU).
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
ITERS = 16


def _make_cores(rng, d, n, rank, dtype):
    cores = []
    for i in range(d):
        rl = 1 if i == 0 else min(rank, 2 ** i, 2 ** (d - i))
        rr = 1 if i == d - 1 else min(rank, 2 ** (i + 1), 2 ** (d - i - 1))
        cores.append(rng.normal(size=(rl, n, rr)).astype(dtype) / np.sqrt(rank))
    return cores


def cpu_round_sweep(cores, target):
    """float64 numpy/LAPACK implementation of the same sweep (the reference's
    kernel chain)."""
    cores = [c.astype(np.float64) for c in cores]
    d = len(cores)
    for i in range(d - 1):
        rl, n, rr = cores[i].shape
        q, r = np.linalg.qr(cores[i].reshape(rl * n, rr))
        k = q.shape[1]
        cores[i] = q.reshape(rl, n, k)
        cores[i + 1] = np.einsum("ab,bnc->anc", r, cores[i + 1])
    for i in range(d - 1, 0, -1):
        rl, n, rr = cores[i].shape
        u, s, vt = np.linalg.svd(cores[i].reshape(rl, n * rr),
                                 full_matrices=False)
        k = min(target, u.shape[1])
        u = u[:, :k] * s[None, :k]
        cores[i] = vt[:k, :].reshape(k, n, rr)
        cores[i - 1] = np.einsum("anb,bk->ank", cores[i - 1], u)
    return cores


_RTT_CACHE = []


def _dispatch_rtt():
    """Round-trip latency of a trivial dispatched program (measured once)."""
    import jax
    import jax.numpy as jnp
    if _RTT_CACHE:
        return _RTT_CACHE[0]
    tiny = jax.jit(lambda x: jnp.sum(x * 2.0))
    x = jnp.ones((8, 8), jnp.float32)
    float(tiny(x))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(tiny(x))
        ts.append(time.perf_counter() - t0)
    _RTT_CACHE.append(min(ts))
    return _RTT_CACHE[0]


_SPREADS = {}


def _time_looped(kernel, cores, iters, repeats: int = 3, name: str = None):
    """Per-iteration seconds via the chained-loop method: iters chained
    executions inside one program; dispatch RTT subtracted.  Runs under
    the f32 kernel discipline (x64 off, matmul precision 'highest' —
    genuine f32 MXU arithmetic, ops/tt_kernels.jit_f32 policy).

    Pick `iters` so the program wall is >= ~0.5 s: for a fast kernel a
    short chain leaves the measurement dominated by tunnel-RTT jitter
    (a 16x2 ms chain is 32 ms of work behind a ~150+-5 ms dispatch —
    +-15% run-to-run spread was observed on the headline kernel).

    ``name`` records the max/min repeat-spread ratio into the JSON's
    ``wall_spread_ratios`` field (VERDICT r4 #2: make variance visible so
    a >1.1x vs_best_wall ratio can be triaged as jitter vs regression
    without a re-run)."""
    import jax
    from xerus_tpu.ops.tt_kernels import make_timed_loop
    rtt = _dispatch_rtt()
    many = make_timed_loop(kernel, iters)

    def run():
        with jax.enable_x64(False), jax.default_matmul_precision("highest"):
            return float(many(cores))

    v = run()  # compile + first run
    assert np.isfinite(v), "kernel produced non-finite values"
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    best = min(times)
    if name is not None:
        _SPREADS[name] = round(max(times) / max(best, 1e-12), 3)
    return max(best - rtt, 1e-9) / iters


def _setup_cache() -> None:
    """Persistent compilation cache: compiles through the tunnel are slow
    (minutes); cache them across bench/study runs.  Callable by the
    benchmarks/ study drivers too — without it every driver re-compiles
    from scratch."""
    import jax
    try:
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main() -> None:
    os.environ.setdefault("XERUS_TPU_NO_X64", "1")
    import jax
    _setup_cache()
    import jax.numpy as jnp
    from functools import partial
    from xerus_tpu.ops.tt_kernels import (_round_sweep_scan, _round_randomized,
                                          round_flops, randomized_round_flops,
                                          _als_half_sweep)
    from xerus_tpu.ops.pallas_tt_eval import pad_cores

    rng = np.random.Generator(np.random.PCG64(0xBAADF00D))
    dtype = np.float32

    # ---------------- workload 1: TT rounding --------------------------
    host_cores = _make_cores(rng, D, N_PHYS, RANK, dtype)
    shapes = [c.shape for c in host_cores]
    dev_cores = tuple(jnp.asarray(c) for c in host_cores)

    # deterministic sweep: bucketed segmented kernel — CholeskyQR3
    # orthogonalization (GEMM-only) + per-bond exact SVD truncation at
    # bucketed true shapes (ops/tt_kernels.py _round_sweep_segmented;
    # replaces the pad-everything-to-256 scan whose boundary ramps wasted
    # most of their QR/SVD on zeros, VERDICT r1 weak#1)
    stacked, _r = pad_cores(host_cores)

    from xerus_tpu.ops.tt_kernels import _round_sweep_segmented

    def det_kernel(cs):
        return tuple(_round_sweep_segmented(list(cs), [TARGET] * (D - 1),
                                            0.0, "svd"))

    tpu_time = _time_looped(det_kernel, dev_cores, ITERS,
                            name="deterministic_segmented_time_s")
    flops = round_flops(shapes, TARGET)   # useful (unpadded) flops
    tflops = flops / tpu_time / 1e12

    # certified GEMM-only exact truncation (method='gemm_exact': Aitken-
    # certified subspace iteration, fused Pallas kernel on aligned
    # shapes; passes the same rtol-1e-8 oracles vs the SVD chain).  On
    # THIS instance — a random TT whose cut-adjacent singular values are
    # Marchenko-Pastur-tight (ratio ~1.004-1.03) — certification costs
    # ~20-65 outer iterations per bond, the same physics that makes the
    # f32 QDWH/Jacobi SVD cost ~2.4 ms at min-dim 256; see the
    # cliff-spectrum row below for the regime where the certified
    # iteration wins.
    def gemm_exact_kernel(cs):
        return tuple(_round_sweep_segmented(list(cs), [TARGET] * (D - 1),
                                            0.0, "gemm_exact"))

    ge_time = _time_looped(gemm_exact_kernel, dev_cores, ITERS,
                           name="deterministic_gemm_exact_time_s")
    ge_tflops = flops / ge_time / 1e12

    # cliff-spectrum instance: a numerically-rank-96 TT carried at full
    # rank 256 with a 1e-6 representation-noise shoulder, rounded to a
    # cap (128) ABOVE its numerical rank — THE production rounding case
    # (canonicalize-with-cap after TT sums / MPO applies, adaptive
    # solvers rounding at max_ranks before the iterate fills them).
    # Every significant direction is kept, the deficit bound sits at the
    # noise floor, and the certified iteration fires in a handful of
    # outer steps where the SVD chain still pays its full ~2.4 ms/bond.
    # (A smooth exponential decay is the OPPOSITE regime — no gap
    # anywhere, kappa beyond f32 orthogonalization range — there the
    # method detects non-certification and falls back to the SVD per
    # bond; documented boundary, use method="svd".)  Same shapes and
    # flop accounting.
    SIGNAL_RANK = 96
    cliff_cores = []
    for c in host_cores:
        rl, n, rr = c.shape
        dl = np.where(np.arange(rl) < SIGNAL_RANK, 1.0, 1e-6).astype(dtype)
        dr = np.where(np.arange(rr) < SIGNAL_RANK, 1.0, 1e-6).astype(dtype)
        cliff_cores.append(c * dl[:, None, None] * dr[None, None, :])
    cliff_dev = tuple(jnp.asarray(c) for c in cliff_cores)
    ge_decay_time = _time_looped(gemm_exact_kernel, cliff_dev, ITERS,
                                 name="deterministic_gemm_exact_cliff_time_s")
    ge_decay_tflops = flops / ge_decay_time / 1e12
    svd_decay_time = _time_looped(det_kernel, cliff_dev, ITERS,
                                  name="deterministic_svd_cliff_time_s")
    svd_decay_tflops = flops / svd_decay_time / 1e12

    # deterministic GEMM-only subspace truncation (no SVD/eigh in the
    # sweep; within 3% of the exact-SVD truncation error, see
    # _trunc_step_subspace)
    def sub_kernel(cs):
        return tuple(_round_sweep_segmented(list(cs), [TARGET] * (D - 1),
                                            0.0, "subspace"))

    sub_time = _time_looped(sub_kernel, dev_cores, 64,
                            name="deterministic_subspace_time_s")
    sub_tflops = flops / sub_time / 1e12

    # all-bonds-at-once GEMM-only deterministic rounding: gram_parallel's
    # batched structure with batched shifted-Cholesky + subspace power
    # iteration instead of eigh (batched chol amortizes on v5e, eigh does
    # not — _round_subspace_parallel)
    from xerus_tpu.ops.tt_kernels import _round_subspace_parallel

    def subpar_kernel(inputs):
        return (_round_subspace_parallel(inputs[0], target_rank=TARGET),)

    subpar_time = _time_looped(subpar_kernel, (stacked,), 128,
                               name="deterministic_parallel_time_s")
    subpar_tflops = flops / subpar_time / 1e12

    def rnd_kernel(cs):
        # UNROLLED true-shape sweep with cholqr1 panels: boundary-ramp
        # sites run at their tiny true ranks and the scan-loop machinery
        # disappears — measured 1.72 ms vs 2.03 ms for the padded
        # lax.scan form (both cholqr1) with bit-identical truncation
        # error (tests/test_kernels.py); householder panels measured
        # 2.81 ms
        return _round_randomized(cs, None, TARGET, 8, qr_method="cholqr1")

    rnd_time = _time_looped(rnd_kernel, dev_cores, 256,
                            name="randomized_round_time_s")
    rnd_tflops = randomized_round_flops(shapes, TARGET, 8) / rnd_time / 1e12

    # streaming two-sided-sketch (generalized Nyström) rounding: no
    # sequential factorization at all — fastest task completion
    from xerus_tpu.ops.tt_kernels import _round_streaming_scan

    def stream_kernel(inputs):
        first, mids, last = _round_streaming_scan(inputs[0],
                                                  target_rank=TARGET,
                                                  psi_oversample=64)
        return (first, mids, last)

    stream_time = _time_looped(stream_kernel, (stacked,), 128,
                               name="streaming_round_time_s")

    # CPU float64 LAPACK baseline (best of 3 — the single-core host
    # jitters by ~15% run to run, which used to leak into the headline)
    cpu_round_sweep(host_cores, TARGET)  # warm caches
    cpu_time = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        cpu_out = cpu_round_sweep(host_cores, TARGET)
        cpu_time = min(cpu_time, time.perf_counter() - t0)

    # ---------------- workload 2: ALS half-sweep -----------------------
    xs = _make_cores(rng, D, N_PHYS, ALS_RANK, np.float64)
    for i in range(D - 1, 0, -1):  # right-canonicalize on host
        rl, n, rr = xs[i].shape
        q, r = np.linalg.qr(xs[i].reshape(rl, n * rr).T)
        xs[i] = q.T.reshape(q.shape[1], n, rr)
        xs[i - 1] = np.einsum("anb,bk->ank", xs[i - 1], r.T)
    x_cores = tuple(jnp.asarray(c.astype(dtype)) for c in xs)
    L = 2.0 * np.eye(N_PHYS) - np.eye(N_PHYS, k=1) - np.eye(N_PHYS, k=-1)
    I = np.eye(N_PHYS)
    A_cores = []
    for i in range(D):
        core = np.zeros((1 if i == 0 else 2, N_PHYS, N_PHYS,
                         1 if i == D - 1 else 2), dtype=dtype)
        if i == 0:
            core[0, :, :, 0] = L; core[0, :, :, 1] = I
        elif i == D - 1:
            core[0, :, :, 0] = I; core[1, :, :, 0] = L
        else:
            core[0, :, :, 0] = I; core[1, :, :, 0] = L; core[1, :, :, 1] = I
        A_cores.append(jnp.asarray(core))
    b_cores = tuple(jnp.asarray(np.ones((1, N_PHYS, 1), dtype=dtype))
                    for _ in range(D))

    def als_kernel(cs):
        return _als_half_sweep(tuple(cs), tuple(A_cores), b_cores)

    # repeats=5: this row read 1.168x of best in BENCH_r04 — measure the
    # spread so jitter and regression are distinguishable (VERDICT r4 #2)
    als_time = _time_looped(als_kernel, x_cores, 32, repeats=5,
                            name="als_halfsweep_d32_poisson_r30_time_s")
    # NOTE a batched-8 variant of this config was measured at 24.8 ms
    # per instance — WORSE than the 21.7 ms single-instance sweep: the
    # rank-30 local solves already saturate the MXU, so batching only
    # pays on latency-bound small-rank configs (the d=10 workloads,
    # WORKLOADS.md).  Not reported here to avoid implying a throughput
    # win at this size.

    # correctness: compare TT log-norms f32-TPU vs f64-CPU (gauge-free)
    from xerus_tpu.ops.tt_kernels import tt_round_sweep_segmented
    out = tt_round_sweep_segmented(list(dev_cores), TARGET)
    log_tpu = _host_tt_log_norm([np.asarray(c, np.float64) for c in out])
    log_cpu = _host_tt_log_norm(cpu_out)
    log_norm_err = abs(log_tpu - log_cpu) / max(abs(log_cpu), 1e-30)

    # ------------- workload 3: matrix-free Lanczos DMRG half-sweep -----
    # d=32 rank-16 Heisenberg two-site ground-state half-sweep with
    # Lanczos-32 local solves (ops/dmrg_kernels.py); the dense-eigh kernel
    # takes 632-783 ms for the same sweep.
    from xerus_tpu.ops.dmrg_kernels import _dmrg_lobpcg_half_sweep_scan
    from functools import partial as _partial
    hx = _make_cores(rng, D, N_PHYS, 16, dtype)
    for i in range(D - 1, 0, -1):
        rl, n, rr = hx[i].shape
        q, r = np.linalg.qr(hx[i].reshape(rl, n * rr).T)
        hx[i] = q.T.reshape(q.shape[1], n, rr)
        hx[i - 1] = np.einsum("anb,bk->ank", hx[i - 1], r.T)
    hx[0] /= np.linalg.norm(hx[0])
    from xerus_tpu.ops.pallas_tt_eval import pad_cores as _pad
    hx_stack, hr = _pad(hx)
    Sz = np.diag([0.5, -0.5]); Sp = np.array([[0., 1.], [0., 0.]])
    Sm = Sp.T; I2 = np.eye(2)
    aH = 5
    H_stack = np.zeros((D, aH, 2, 2, aH), dtype)
    for i in range(D):
        W = np.zeros((aH, 2, 2, aH), dtype)
        W[0, :, :, 0] = I2
        W[0, :, :, 1] = 0.5 * Sp; W[0, :, :, 2] = 0.5 * Sm
        W[0, :, :, 3] = Sz
        W[1, :, :, 4] = Sm; W[2, :, :, 4] = Sp; W[3, :, :, 4] = Sz
        W[4, :, :, 4] = I2
        if i == 0:
            W2 = np.zeros_like(W); W2[0] = W[0]; W = W2
        if i == D - 1:
            W2 = np.zeros_like(W)
            W2[:, :, :, 4] = W[:, :, :, 4]
            W2[0, :, :, 4] = W[0, :, :, 1] @ Sm + W[0, :, :, 2] @ Sp \
                + W[0, :, :, 3] @ Sz
            W = W2
        H_stack[i] = W
    dmrg_body = _partial(_dmrg_lobpcg_half_sweep_scan, rank=int(hr),
                         lobpcg_iters=32, solver="lanczos")

    def dmrg_kernel(inputs):
        out, e = dmrg_body(inputs[0], jnp.asarray(H_stack))
        return (out,)

    dmrg_time = _time_looped(dmrg_kernel, (jnp.asarray(hx_stack),), 64,
                             repeats=5,
                             name="dmrg_lanczos_halfsweep_d32_r16_time_s")

    # ------------- workload 4: Ozaki split GEMM (f64-quality matmul) ----
    from xerus_tpu.ops.ozaki import ozaki_matmul
    NO = 512
    Ao = jnp.asarray(rng.normal(size=(NO, NO)).astype(np.float32))
    Bo = jnp.asarray(rng.normal(size=(NO, NO)).astype(np.float32))
    zo = jnp.zeros_like(Ao)

    def oz_kernel(inputs):
        ch, cl = ozaki_matmul(inputs[0], zo, Bo, zo)
        return (ch,)

    oz_time = _time_looped(oz_kernel, (Ao,), 8192, repeats=5,
                           name="ozaki_f64quality_matmul_512_time_s")
    oz_tflops = 2.0 * NO ** 3 / oz_time / 1e12

    # ------------- rounding scaling rows (rank 512 / 1024) -------------
    # The compute-bound evidence previously lived only in docs
    # (README.md:87); capture it in the driver-run bench (VERDICT r2 #3).
    scaling = {}
    for big_rank, iters_b in ((512, 128), (1024, 48)):
        cores_b = _make_cores(rng, D, N_PHYS, big_rank, dtype)
        shapes_b = [c.shape for c in cores_b]
        dev_b = tuple(jnp.asarray(c) for c in cores_b)
        tgt = big_rank // 2

        def rnd_kernel_b(cs, tgt=tgt):
            return _round_randomized(cs, None, tgt, 8, qr_method="cholqr1")

        t_b = _time_looped(rnd_kernel_b, dev_b, iters_b,
                           name=f"randomized_round_rank{big_rank}_time_s")
        scaling[f"randomized_round_rank{big_rank}_time_s"] = round(t_b, 6)
        scaling[f"randomized_round_rank{big_rank}_tflops"] = round(
            randomized_round_flops(shapes_b, tgt, 8) / t_b / 1e12, 3)

        if big_rank == 1024:
            # bf16-frontier variant (VERDICT r3 #4, measured campaign in
            # doc/performance.md round-4): bulk GEMMs at one bf16 MXU pass,
            # cholqr1 Gram/orthonormalization kept at bf16x3 ('high') —
            # 5.4% truncation-error cost on the discriminating decaying-
            # spectrum instance (within the 1.1x bar), ~1.5x throughput.
            # knobs come from the PUBLIC preset consumed by
            # TTNetwork.round_fast(speed="bf16_frontier") — one source of
            # truth between the object API and this row
            from xerus_tpu.ops.tt_kernels import SPEED_PRESETS
            _bf = SPEED_PRESETS["bf16_frontier"]

            def rnd_kernel_bf16(cs, tgt=tgt):
                return _round_randomized(cs, None, tgt, 8,
                                         qr_method="cholqr1",
                                         precision=_bf["precision"],
                                         gram_precision=_bf["gram_precision"])

            t_bf = _time_looped(rnd_kernel_bf16, dev_b, iters_b,
                                name="randomized_round_rank1024_bf16_time_s")
            scaling["randomized_round_rank1024_bf16_time_s"] = round(t_bf, 6)
            scaling["randomized_round_rank1024_bf16_tflops"] = round(
                randomized_round_flops(shapes_b, tgt, 8) / t_bf / 1e12, 3)

    # headline: TASK SPEEDUP — wall-clock of the reference's rounding task
    # (CPU f64 LAPACK chain) over our best task completion (randomized
    # sweep, quality cross-checked below).  Per-kernel TFLOP/s are
    # reported as sub-fields; no TFLOP/s number is synthesized from one
    # algorithm's flops and another's wall (VERDICT r1 weak#2).
    # streaming is excluded from the headline: its truncation error is a
    # single-digit multiple of optimal (weaker task completion than the
    # 2-3x-optimal randomized sweep the CPU baseline is compared against)
    best_time = min(tpu_time, rnd_time)
    # History anchoring (VERDICT r2 weak#3): the single-core host jitters
    # far beyond best-of-3 when the driver contends with it (CPU wall
    # 0.56 s in r01 vs 1.37 s in r02 inflated the headline ~2.4x).  The
    # headline uses the best-known CPU wall, so a contended host can only
    # DEFLATE the number, never fake progress.
    hist = _load_history()
    cpu_best = min(cpu_time, hist.get("cpu_f64_lapack_time_s", cpu_time))
    # MFU context: v5e peak is ~197 bf16 TFLOP/s per chip; these kernels
    # run f32 with matmul precision 'highest' (~6 bf16 MXU passes), so
    # the achievable f32 ceiling is ~197/6 ~= 33 TFLOP/s.  Sequential
    # small-matrix factorization chains are latency-bound, so MFU is
    # inherently small — reported to make the TFLOP/s interpretable.
    V5E_BF16_PEAK = 197.0
    V5E_F32_HIGHEST_PEAK = V5E_BF16_PEAK / 6.0

    result = {
        "metric": "tt_round_d32_n2_r256_to_r128_task_speedup",
        "value": round(cpu_best / best_time, 2),
        "unit": "x vs CPU f64 LAPACK (history-anchored)",
        "vs_baseline": round(cpu_best / best_time, 2),
        "deterministic_segmented_time_s": round(tpu_time, 6),
        "deterministic_segmented_tflops": round(tflops, 4),
        "deterministic_gemm_exact_time_s": round(ge_time, 6),
        "deterministic_gemm_exact_tflops": round(ge_tflops, 4),
        "deterministic_gemm_exact_cliff_time_s": round(ge_decay_time, 6),
        "deterministic_gemm_exact_cliff_tflops": round(ge_decay_tflops, 4),
        "deterministic_svd_cliff_time_s": round(svd_decay_time, 6),
        "deterministic_svd_cliff_tflops": round(svd_decay_tflops, 4),
        "deterministic_subspace_time_s": round(sub_time, 6),
        "deterministic_subspace_tflops": round(sub_tflops, 4),
        "deterministic_parallel_time_s": round(subpar_time, 6),
        "deterministic_parallel_tflops": round(subpar_tflops, 4),
        "randomized_round_time_s": round(rnd_time, 6),
        "randomized_round_tflops": round(rnd_tflops, 4),
        "randomized_mfu_pct_of_f32_peak": round(
            100.0 * rnd_tflops / V5E_F32_HIGHEST_PEAK, 2),
        "streaming_round_time_s": round(stream_time, 6),
        "cpu_f64_lapack_time_s": round(cpu_time, 5),
        "cpu_f64_lapack_best_s": round(cpu_best, 5),
        "als_halfsweep_d32_poisson_r30_time_s": round(als_time, 6),
        "dmrg_lanczos_halfsweep_d32_r16_time_s": round(dmrg_time, 6),
        "ozaki_f64quality_matmul_512_time_s": round(oz_time, 8),
        "ozaki_f64quality_matmul_512_tflops": round(oz_tflops, 3),
        "f32_vs_f64_log_norm_rel_err": f"{log_norm_err:.2e}",
        "timing": "chained-loop, RTT-cancelled",
        "device": str(jax.devices()[0]),
    }
    result.update(scaling)
    _e2e_poisson_row(result)
    _e2e_dmrg_row(result)
    result["wall_spread_ratios"] = dict(_SPREADS)
    # current-vs-best wall ratios (>1 = regression vs best-known run)
    result["vs_best_wall_ratios"] = _update_history(result, hist)
    print(json.dumps(result))


E2E_MARKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache", "e2e_poisson_marker.json")
E2E_N1, E2E_N2 = 16, 2


def _e2e_poisson_row(result: dict) -> None:
    """BASELINE.json's north-star workload as a DRIVER-CAPTURED row
    (VERDICT r4 #1): the FULL d=32 rank-30 QTT Poisson ALS solve — f32
    while_loop half-sweeps to the f32 plateau + in-program df32 finish,
    ONE XLA program / ONE dispatch (ops.mixed_precision.make_als_f32_df_run,
    same staged fused mode as benchmarks/poisson_solve_e2e.py) — with the
    solution residual verified on the host in f64.

    Tunnel economics: warm (persistent .jax_cache) the whole solve is
    ~0.7 s wall; cold it is a ~900 s tunnel compile.  A marker file
    written after the first successful warm run gates the row: cold cache
    + no XERUS_BENCH_E2E_COLD=1 → skip with reason rather than risk the
    driver's budget.  XERUS_BENCH_E2E=0 skips unconditionally."""
    if os.environ.get("XERUS_BENCH_E2E") == "0":
        result["e2e_poisson_d32_skip_reason"] = "disabled via XERUS_BENCH_E2E=0"
        return
    warm = os.path.exists(E2E_MARKER)
    if not warm and os.environ.get("XERUS_BENCH_E2E_COLD") != "1":
        result["e2e_poisson_d32_skip_reason"] = (
            "compile cache cold (no marker): first compile is ~900 s through "
            "the tunnel; run once with XERUS_BENCH_E2E_COLD=1 to warm it")
        return
    try:
        import jax
        import jax.numpy as jnp
        from xerus_tpu.ops.mixed_precision import make_als_f32_df_run
        from xerus_tpu.ops.df32 import df_from_f64, df_to_f64

        rng = np.random.Generator(np.random.PCG64(0xBAADF00D))
        xs = []
        for i in range(D):
            rl = 1 if i == 0 else min(ALS_RANK, 2 ** i, 2 ** (D - i))
            rr = 1 if i == D - 1 else min(ALS_RANK, 2 ** (i + 1),
                                          2 ** (D - i - 1))
            xs.append(rng.normal(size=(rl, 2, rr)) / np.sqrt(ALS_RANK))
        for i in range(D - 1, 0, -1):      # right-canonicalize (core at 0)
            rl, n, rr = xs[i].shape
            q, r = np.linalg.qr(xs[i].reshape(rl, n * rr).T)
            xs[i] = q.T.reshape(q.shape[1], n, rr)
            xs[i - 1] = np.einsum("anb,bk->ank", xs[i - 1], r.T)
        L = 2.0 * np.eye(2) - np.eye(2, k=1) - np.eye(2, k=-1)
        I = np.eye(2)
        A64 = []
        for i in range(D):
            core = np.zeros((1 if i == 0 else 2, 2, 2,
                             1 if i == D - 1 else 2))
            if i == 0:
                core[0, :, :, 0] = L; core[0, :, :, 1] = I
            elif i == D - 1:
                core[0, :, :, 0] = I; core[1, :, :, 0] = L
            else:
                core[0, :, :, 0] = I; core[1, :, :, 0] = L
                core[1, :, :, 1] = I
            A64.append(core)
        b64 = [np.ones((1, 2, 1)) for _ in range(D)]

        x32 = tuple(jnp.asarray(c.astype(np.float32)) for c in xs)
        A32 = tuple(jnp.asarray(c.astype(np.float32)) for c in A64)
        b32 = tuple(jnp.asarray(c.astype(np.float32)) for c in b64)
        A_df = tuple(df_from_f64(c) for c in A64)
        b_df = tuple(df_from_f64(c) for c in b64)
        jax.block_until_ready(x32)

        shapes_key = tuple(tuple(c.shape) for c in x32)
        run = make_als_f32_df_run(shapes_key, "float32", E2E_N1, E2E_N2)
        t0 = time.perf_counter()
        c2, hist_arr, cnt = run(x32, A32, b32, A_df, b_df)
        int(cnt)
        t_first = time.perf_counter() - t0
        # measured solve: warm program, fresh start; the int(cnt) fetch is
        # the ONLY sync — the wall includes the dispatch RTT (it is part
        # of the task: one dispatch per solve)
        t0 = time.perf_counter()
        c2, hist_arr, cnt = run(x32, A32, b32, A_df, b_df)
        cnt = int(cnt)
        t_solve = time.perf_counter() - t0
        sol = [df_to_f64(np.asarray(h), np.asarray(l)) for (h, l) in c2]
        res_f64 = _host_poisson_residual(sol, A64, b64)
        result["e2e_poisson_d32_solve_wall_s"] = round(t_solve, 4)
        result["e2e_poisson_d32_first_run_s"] = round(t_first, 2)
        result["e2e_poisson_d32_residual_f64"] = f"{res_f64:.3e}"
        result["e2e_poisson_d32_f32_halfsweeps"] = cnt
        result["e2e_poisson_d32_df_halfsweeps"] = E2E_N2
        # CPU f64 reference for the SAME instance: 298 s object-level ALS
        # (doc/performance.md, measured round 1)
        result["e2e_poisson_d32_vs_cpu_f64"] = round(298.0 / t_solve, 1)
        try:
            with open(E2E_MARKER, "w") as fh:
                json.dump({"shapes": str(shapes_key), "n1": E2E_N1,
                           "n2": E2E_N2}, fh)
        except Exception:
            pass
    except Exception as e:          # never take the whole bench down
        result["e2e_poisson_d32_skip_reason"] = f"failed: {type(e).__name__}: {e}"


E2E_DMRG_MARKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache", "e2e_dmrg_marker.json")


def _e2e_dmrg_row(result: dict) -> None:
    """Second driver-captured END-TO-END workload: the d=32 Heisenberg
    two-site DMRG ground state through the PUBLIC object API
    (xe.smallest_eigenvalue, matrix-free Lanczos local solves) — workload
    4 of BASELINE.json's config list, the largest measured speedup of the
    round-5 matched pair (WORKLOADS.md: 0.434 s vs 36.6 s CPU f64 at
    5-decimal energy agreement).

    Runs as a SUBPROCESS of the committed workload driver
    (benchmarks/all_workloads.py --tpu --only 4) rather than in-process:
    bench's XERUS_TPU_NO_X64=1 disables x64 globally, which silently
    degrades the object-layer instance construction (f32 canonicalization
    of a norm-1e13 random start) and the host residual readout — the
    CLAUDE.md measurement pitfall, observed here as a fake 3e-1 residual
    and a worse converged energy.  The subprocess keeps the workload
    driver's f64 object layer + f32 kernel discipline.  Marker-gated like
    the Poisson row: cold kernel compiles are minutes through the
    tunnel."""
    if os.environ.get("XERUS_BENCH_E2E") == "0":
        result["e2e_dmrg_d32_skip_reason"] = "disabled via XERUS_BENCH_E2E=0"
        return
    warm = os.path.exists(E2E_DMRG_MARKER)
    if not warm and os.environ.get("XERUS_BENCH_E2E_COLD") != "1":
        result["e2e_dmrg_d32_skip_reason"] = (
            "compile cache cold (no marker): run once with "
            "XERUS_BENCH_E2E_COLD=1 to warm it")
        return
    try:
        import subprocess
        env = {k: v for k, v in os.environ.items() if k != "XERUS_TPU_NO_X64"}
        r = subprocess.run(
            [sys.executable, "-u",
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "benchmarks", "all_workloads.py"),
             "--tpu", "--only", "4"],
            capture_output=True, text=True, timeout=1500, env=env)
        line = next(l for l in r.stdout.splitlines()
                    if l.startswith("{") and "dmrg_heisenberg" in l)
        d = json.loads(line)
        result["e2e_dmrg_d32_solve_wall_s"] = d["seconds"]
        result["e2e_dmrg_d32_warm_s"] = d["warm_s"]
        result["e2e_dmrg_d32_ground_energy"] = d["ground_energy"]
        result["e2e_dmrg_d32_eig_residual"] = d["eig_residual"]
        # CPU f64 reference for the SAME seeded instance: 36.646 s
        # (WORKLOADS.md round-5 matched pair)
        result["e2e_dmrg_d32_vs_cpu_f64"] = round(36.646 / d["seconds"], 1)
        try:
            with open(E2E_DMRG_MARKER, "w") as fh:
                json.dump({"d": D, "max_rank": 16, "sweeps": 6}, fh)
        except Exception:
            pass
    except Exception as e:
        result["e2e_dmrg_d32_skip_reason"] = f"failed: {type(e).__name__}: {e}"


def _host_poisson_residual(sol, A64, b64) -> float:
    """Host-f64 relative residual ||Ax-b||/||b|| of a TT solution via the
    z = [Ax, -b] stacked-TT log-norm (overflow-safe QR env sweep)."""
    z = []
    d = len(sol)
    for k in range(d):
        ax = np.einsum("amnb,unU->aumbU", A64[k], sol[k]).reshape(
            A64[k].shape[0] * sol[k].shape[0], 2, -1)
        bc = b64[k]
        if k == 0:
            z.append(np.concatenate([ax, -bc], axis=2))
        elif k == d - 1:
            z.append(np.concatenate([ax, bc], axis=0))
        else:
            al, m, ar = ax.shape
            bl, _, br = bc.shape
            top = np.concatenate([ax, np.zeros((al, m, br))], axis=2)
            bot = np.concatenate([np.zeros((bl, m, ar)), bc], axis=2)
            z.append(np.concatenate([top, bot], axis=0))

    def log_norm(cores):
        R = np.ones((1, 1))
        logs = 0.0
        for c in cores[:-1]:
            cur = np.einsum("ka,anb->knb", R, c).reshape(-1, c.shape[2])
            _, R = np.linalg.qr(cur)
            nrm = np.linalg.norm(R)
            logs += np.log(max(nrm, 1e-300))
            R = R / nrm
        last = np.einsum("ka,anb->knb", R, cores[-1])
        return logs + np.log(max(np.linalg.norm(last), 1e-300))

    return float(np.exp(log_norm(z) - log_norm(b64)))


HISTORY_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_history.json")


def _load_history() -> dict:
    try:
        with open(HISTORY_PATH) as fh:
            return json.load(fh)
    except Exception:
        return {}


def _update_history(result: dict, hist: dict) -> dict:
    """Merge this run's walls into the best-known history and return the
    current/best ratios (regression indicator, VERDICT r2 #3)."""
    vs_best = {}
    for k, v in result.items():
        if k.endswith("_time_s") and isinstance(v, (int, float)):
            best = hist.get(k)
            if best is not None and best > 0:
                vs_best[k] = round(v / best, 3)
            hist[k] = min(v, best) if best is not None else v
    try:
        with open(HISTORY_PATH, "w") as fh:
            json.dump(hist, fh, indent=1)
            fh.write("\n")
    except Exception:
        pass
    return vs_best


def _host_tt_log_norm(cores) -> float:
    """log(frobenius norm) of a TT via a scaled env sweep (overflow-safe)."""
    env = np.ones((1, 1))
    log_acc = 0.0
    for c in cores:
        env = np.einsum("uv,unU,vnV->UV", env, c, c)
        nrm = np.linalg.norm(env)
        if nrm > 0:
            env = env / nrm
            log_acc += np.log(nrm)
    return 0.5 * log_acc


def _probe_backend(timeout_s: int = 240, attempts: int = 3) -> bool:
    """Backend-init watchdog: the TPU tunnel can wedge so hard that even
    jax.devices() blocks forever (CLAUDE.md), which would leave the
    caller with NO output at all.  Probe in a subprocess with a timeout;
    on persistent failure the caller prints an explicit error JSON
    instead of hanging."""
    import subprocess
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); import jax.numpy as jnp; "
                 "print(float(jnp.ones(()) + 1))"],
                timeout=timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if i + 1 < attempts:
            time.sleep(120)
    return False


if __name__ == "__main__":
    if os.environ.get("XERUS_BENCH_SKIP_PROBE") != "1" and not _probe_backend():
        print(json.dumps({
            "metric": "tt_round_d32_n2_r256_to_r128_task_speedup",
            "value": 0.0, "unit": "x vs CPU f64 LAPACK", "vs_baseline": 0.0,
            "error": "jax backend init blocked >3x240s (wedged TPU tunnel); "
                     "no measurement possible this run"}))
        sys.exit(0)
    main()
