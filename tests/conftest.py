"""Test harness: force an 8-device virtual CPU platform.

Multi-chip TPU hardware is unavailable in CI; sharding/collective tests run
on a simulated 8-device CPU mesh (the standard JAX pattern the reference —
single-process nn.DataParallel — never needed).
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
