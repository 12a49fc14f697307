"""Unit coverage for bench.py's driver-contract helpers (the bench itself
runs on TPU via the driver; these guard the pieces that must not regress:
the one-JSON-line contract and the backend wait added after the 2026-08-17
tunnel outage)."""

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_wait_for_backend_cpu_fast_path(monkeypatch):
    """With JAX_PLATFORMS=cpu the subprocess probe initializes the CPU
    backend immediately (the probe's config update must beat the image's
    sitecustomize axon pin)."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    m = _load_bench()
    assert m.wait_for_backend() is True


def test_wait_for_backend_budget_lapses(monkeypatch):
    """A probe that always fails returns False once the budget lapses,
    without raising (main() then emits the device_unavailable flag)."""
    import subprocess

    monkeypatch.setenv("IUNET_BENCH_DEVICE_WAIT", "0")
    m = _load_bench()

    class _R:
        returncode = 1
        stderr = b"RuntimeError: Unable to initialize backend 'axon'"

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _R())
    assert m.wait_for_backend() is False


def test_emit_contract(capsys):
    """One JSON line with the driver-contract keys, ceiling included."""
    m = _load_bench()
    m._LAST_CEILING[0] = 7.5
    m.emit("test_metric", 1.23456, "things/s", 2.345)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(line)
    assert d == {"metric": "test_metric", "value": 1.235,
                 "unit": "things/s", "vs_baseline": 2.35,
                 "device_ceiling_tflops": 7.5}
