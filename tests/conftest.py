"""Test harness: force an 8-device virtual CPU platform.

Multi-chip TPU hardware is unavailable in CI; sharding/collective tests run
on a simulated 8-device CPU mesh.  NOTE: this image's sitecustomize
pre-registers a tunneled TPU backend and pins JAX_PLATFORMS=axon, so env
vars alone are ignored — ``jax.config.update('jax_platforms', 'cpu')``
before first backend use is the only reliable override here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert len(jax.devices()) == 8, f"expected 8 CPU devices, got {jax.devices()}"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
