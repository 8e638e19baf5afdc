"""Test environment: force CPU backend with 8 virtual devices BEFORE jax import.

This is the multi-chip test strategy from SURVEY.md §4: sharding/collective
logic is validated on a fake 8-device CPU mesh; real-TPU benchmarks run
separately via bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
