"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is validated
against XLA's host-platform virtual devices instead. The env vars must be set
before jax is first imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# keep matmuls deterministic/accurate for parity tests
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

# The axon sitecustomize registers the TPU backend and pins
# jax_platforms="axon,cpu" before conftest runs; override it here so tests
# never touch the tunneled TPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "timeout(seconds): advisory wall-clock budget for a test"
    )


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
