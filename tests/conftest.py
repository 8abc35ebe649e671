"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU analog of a fake-backend multi-node test: sharding and
collective code paths compile and execute exactly as they would on an
8-chip slice, just on host CPU.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    return 92  # the reference's recommended reproducibility seed
