"""Structured metrics/observability.

The reference's only observability is carriage-return progress prints and a
final loss-history pickle (SURVEY.md §5).  Here: per-step/epoch scalars as
JSONL (machine-readable, append-only) plus a throughput meter used by the
benchmark harness, and an optional ``jax.profiler`` trace context.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Optional


class JsonlLogger:
    def __init__(self, path: Optional[str]) -> None:
        self.path = path
        self._fh = open(path, "a") if path else None

    def write(self, **record) -> None:
        record.setdefault("time", time.time())
        if self._fh is not None:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


class Throughput:
    """images/sec meter with warmup exclusion."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self._t0 = None
        self._images = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()
        self._images = 0

    def update(self, n_images: int) -> None:
        self._images += n_images

    @property
    def images_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._images / dt if dt > 0 else 0.0


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
