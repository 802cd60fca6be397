"""Tracing / profiling hooks (the reference has none — SURVEY §5; this is
the TPU-native observability layer: jax.profiler traces + step timing)."""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(out_dir: Optional[str]) -> Iterator[None]:
  """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto) for
  the enclosed block when `out_dir` is set; no-op otherwise."""
  if not out_dir:
    yield
    return
  import jax
  jax.profiler.start_trace(out_dir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


class step_timer:
  """Rolling per-step wall-clock stats for the train loop."""

  def __init__(self, window: int = 50):
    self.window = window
    self.times = []
    self._last = None

  def tick(self):
    now = time.perf_counter()
    if self._last is not None:
      self.times.append(now - self._last)
      if len(self.times) > self.window:
        self.times.pop(0)
    self._last = now

  @property
  def mean_ms(self) -> float:
    return 1e3 * sum(self.times) / max(len(self.times), 1)

  @property
  def steps_per_sec(self) -> float:
    m = sum(self.times) / max(len(self.times), 1)
    return 1.0 / m if m > 0 else 0.0
