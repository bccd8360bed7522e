"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run without TPU hardware, per the framework's multi-chip test strategy.

Note: this image pins JAX_PLATFORMS=axon at interpreter startup, so the env
var alone is not enough — we must override through jax.config before any
backend is initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
