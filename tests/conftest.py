"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU analog of a fake-backend multi-node test: sharding and
collective code paths compile and execute exactly as they would on an
8-chip slice, just on host CPU.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# the axon TPU sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# startup; override it again so tests really run on the virtual CPU mesh
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture(scope="session")
def rng_seed():
    return 92  # the reference's recommended reproducibility seed


# Optional persistent XLA compilation cache (opt-in via
# SIV_TEST_COMPILE_CACHE=<dir>): cuts warm re-runs of the fast profile to
# ~70s, BUT this host's XLA:CPU AOT cache records compile-machine features
# that don't match the execution machine ("could lead to SIGILL" — observed
# as Fatal aborts mid-suite), so it is NOT enabled by default.
_CACHE_DIR = os.environ.get("SIV_TEST_COMPILE_CACHE")
if _CACHE_DIR:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
