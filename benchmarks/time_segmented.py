"""Time the bucketed segmented deterministic rounding kernel on TPU.

Usage: python -u benchmarks/time_segmented.py [svd|gram] [iters]
"""
import os
import sys
import time

os.environ.setdefault("XERUS_TPU_NO_X64", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from xerus_tpu.ops.tt_kernels import (_round_sweep_segmented, round_flops,
                                      make_timed_loop)

D, N, RANK, TARGET = 32, 2, 256, 128
method = sys.argv[1] if len(sys.argv) > 1 else "svd"
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 16

rng = np.random.Generator(np.random.PCG64(0xBAADF00D))
cores = []
for i in range(D):
    rl = 1 if i == 0 else min(RANK, 2 ** i, 2 ** (D - i))
    rr = 1 if i == D - 1 else min(RANK, 2 ** (i + 1), 2 ** (D - i - 1))
    cores.append(jnp.asarray(
        rng.normal(size=(rl, N, rr)).astype(np.float32) / np.sqrt(RANK)))
cores = tuple(cores)
flops = round_flops([c.shape for c in cores], TARGET)
print("flops: %.3f GF" % (flops / 1e9), flush=True)

tiny = jax.jit(lambda x: jnp.sum(x * 2.0))
xx = jnp.ones((8, 8), jnp.float32)
float(tiny(xx))
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    float(tiny(xx))
    ts.append(time.perf_counter() - t0)
rtt = min(ts)
print("rtt %.1f ms" % (rtt * 1e3), flush=True)


def kernel(cs):
    return tuple(_round_sweep_segmented(list(cs), [TARGET] * (D - 1),
                                        0.0, method))


many = make_timed_loop(kernel, ITERS)


def run():
    with jax.enable_x64(False), jax.default_matmul_precision("highest"):
        return float(many(cores))


t0 = time.perf_counter()
v = run()
print("%s compile+run %.1f s finite=%s" % (method, time.perf_counter() - t0,
                                           np.isfinite(v)), flush=True)
best = 1e9
for _ in range(2):
    t0 = time.perf_counter()
    run()
    best = min(best, time.perf_counter() - t0)
per = max(best - rtt, 1e-9) / ITERS
print("%s per-iter %.3f ms  %.3f TFLOP/s" % (method, per * 1e3,
                                             flops / per / 1e12), flush=True)
