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

# Key the persistent cache by the host CPU's feature set: XLA:CPU caches
# AOT-compiled machine code, and a cache written on a different host type
# (these VMs migrate) gets loaded with "may SIGILL" warnings — observed as
# a mid-suite fatal interpreter abort in round 3.  A per-CPU-signature dir
# makes that impossible while still sharing the cache within one host type.
def _cpu_sig() -> str:
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            flags = next(ln for ln in f if ln.startswith("flags"))
    except (OSError, StopIteration):
        flags = "unknown"
    return hashlib.sha1(flags.encode()).hexdigest()[:12]


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      f"/tmp/jax_cache_{_cpu_sig()}")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
