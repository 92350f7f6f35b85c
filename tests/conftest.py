"""Test harness config: run everything on an 8-virtual-device CPU backend.

The axon sitecustomize hook overrides JAX_PLATFORMS at interpreter start,
so the env var alone is not enough — we must also update the jax config
before any backend is used. This must happen before test modules import
jax-dependent code (SURVEY.md §4: multi-chip tests via the CPU device-count
override stand in for the reference's nonexistent distributed tests).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
