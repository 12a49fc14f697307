"""Structured timing + optional jax.profiler traces (SURVEY §5.1: the
reference has only ad-hoc wall-clock prints, e.g. predict.py:263-264)."""

from __future__ import annotations

import contextlib
import json
import threading
import time
from pathlib import Path


class Timer:
    """Accumulates named wall-clock spans; report() returns a dict.
    Thread-safe: concurrent spans (e.g. two shard-writer threads in
    engine.predict) accumulate under a lock — the read-modify-write add
    would otherwise lose updates."""

    def __init__(self):
        self.spans: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.spans[name] = self.spans.get(name, 0.0) + dt
                self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> dict:
        return {k: {"total_s": round(v, 4), "count": self.counts[k],
                    "mean_ms": round(v / self.counts[k] * 1e3, 3)}
                for k, v in self.spans.items()}

    def dump(self, path):
        Path(path).write_text(json.dumps(self.report(), indent=2))


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """jax.profiler trace when a directory is given, no-op otherwise.
    View with TensorBoard / xprof."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
