"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (SURVEY.md §4 rebuild mapping).

NOTE: the environment pins JAX_PLATFORMS=axon (the TPU tunnel), so we must
override both the env var and the live jax config before anything builds a
backend; every TPU compile goes through the tunnel at ~20-40s which would
make the unit suite unusable.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _deterministic_seed():
    """Deterministic seed per test (reference: 0xBAADF00D, test.cpp:90-96)."""
    import xerus_tpu
    xerus_tpu.set_seed(0xBAADF00D)
    yield
