"""Test configuration: force an 8-device CPU platform.

This is the JAX idiom for testing multi-chip sharding without TPUs
(SURVEY.md §4): all mesh/pjit tests run against 8 virtual CPU devices.

Note: this environment pre-imports jax via sitecustomize and pins
JAX_PLATFORMS to a remote TPU plugin, so env vars alone are too late —
we must override through jax.config before any backend is initialized.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
