"""Profiling / tracing hooks (no reference analogue — SURVEY.md §5 records
the reference has only wall-clock prints; this is the TPU-native upgrade).

- ``trace(dir)``: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of the wrapped steps.
- ``StepTimer``: wall-clock per-step timing with device sync on demand —
  the honest way to time async dispatch.
- ``annotate``: named TraceAnnotation for host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Profile the enclosed block into ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling samples/sec with explicit device sync at measure points."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.rows = 0
        self._t0: Optional[float] = None

    def step(self, batch_rows: int, sync_value=None) -> None:
        self.count += 1
        if self.count == self.warmup:
            if sync_value is not None:
                jax.block_until_ready(sync_value)
            self._t0 = time.perf_counter()
            self.rows = 0
        elif self.count > self.warmup:
            self.rows += batch_rows

    def samples_per_sec(self, sync_value=None) -> float:
        if self._t0 is None or self.rows == 0:
            return 0.0
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        return self.rows / (time.perf_counter() - self._t0)
