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

# NO persistent compile cache in tests.  Two fatal failure modes were
# reproduced with XLA:CPU persistent caching (round-3/4 verdicts): a
# mid-suite `Fatal Python error: Aborted` in the cache WRITE serializing a
# giant AOT scan executable, and "may SIGILL" loads of machine code cached
# on a different (pre-migration) host CPU.  jaxsetup.enable_compile_cache()
# now keeps the cache off on CPU by default; forcing IUNET_JAX_CACHE=0 here
# additionally makes the suite hermetic against driver/CI environments that
# export a cache dir.  The suite must be green from a cold cache anyway —
# in-process jit caching is unaffected.
os.environ["IUNET_JAX_CACHE"] = "0"
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
