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


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Drop jit caches (and their live XLA:CPU executables) after every
    test module.  This jax build's CPU backend segfaults inside
    backend_compile once a single process accumulates enough compiled
    programs (reproduced 3x at the same suite position, independent of
    WHICH test compiles next; glibc heap checking found nothing; solo
    runs of the crashing tests always pass).  Bounding the live-program
    population keeps the canonical single-process `pytest tests/` run
    under the threshold.  Cross-module jit sharing is rare, so the
    recompile cost is small."""
    yield
    import jax

    jax.clear_caches()


# -- process isolation for the suite's giant-compile tests --------------------
# XLA:CPU has crashed hard (SIGSEGV/abort in backend_compile, rounds 3-5)
# compiling the suite's LARGEST scan programs late in a long single-process
# run — always at the same giant-compile test, never when that test runs in
# a fresh process (solo runs pass deterministically, ~90 s).  The crash is
# cumulative native state in this jax build, not the program: isolating the
# few known-giant compiles into child pytest processes keeps the canonical
# `python -m pytest tests/ -q` green without skipping anything — the child
# runs the full test body and its result is reported through the parent.

def isolated_process(fn):
    """Run the decorated test in its own pytest process (fresh XLA state).

    In the child (IUNET_TEST_IN_CHILD=1) the body runs normally.  In the
    parent, spawn `pytest <this nodeid>` and fail with the child's output
    if it fails.  Fixtures still bind in the parent but go unused."""
    import functools
    import subprocess
    import sys
    from pathlib import Path

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if os.environ.get("IUNET_TEST_IN_CHILD"):
            return fn(*args, **kwargs)
        root = Path(__file__).resolve().parent.parent
        nodeid = (f"{Path(fn.__code__.co_filename).relative_to(root)}"
                  f"::{fn.__name__}")
        env = {**os.environ, "IUNET_TEST_IN_CHILD": "1"}
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-x", nodeid],
            cwd=root, env=env, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, (
            f"isolated child run of {nodeid} failed (rc={r.returncode}):\n"
            f"{r.stdout[-4000:]}\n{r.stderr[-2000:]}")
    return wrapper
