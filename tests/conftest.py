"""Test config: force JAX onto CPU with 8 virtual devices so sharding tests
run without TPU hardware (SURVEY §4 fake-backend strategy).  Must run before
the first jax import anywhere in the test process."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# This image's sitecustomize force-registers a TPU PJRT plugin and pins
# JAX_PLATFORMS=axon; the env var alone does not win.  The config update
# after import does.
import jax

jax.config.update("jax_platforms", "cpu")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
