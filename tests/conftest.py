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
# Persistent XLA:CPU compile cache: the suite's wall time is dominated by
# re-compiling near-identical jitted train/eval steps (round 3: 48 min).
# Caching only the slow programs keeps the cache small; warm runs skip the
# multi-minute step_fn compiles entirely.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
