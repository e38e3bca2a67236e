"""One-time warm-up of the bench e2e Poisson fused program through the
TPU tunnel (writes the persistent compile cache + the marker file bench.py
gates on).  Run: setsid nohup python -u benchmarks/warm_e2e.py > log &"""
import os, sys, json, time
os.environ.setdefault("XERUS_TPU_NO_X64", "1")
os.environ["XERUS_BENCH_E2E_COLD"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench
bench._setup_cache()
import jax
print("devices:", jax.devices(), flush=True)
t0 = time.time()
r = {}
bench._e2e_poisson_row(r)
print("warm result:", json.dumps(r), flush=True)
print("total %.1f s" % (time.time() - t0), flush=True)
