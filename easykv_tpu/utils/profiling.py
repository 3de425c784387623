"""Profiling helpers: jax.profiler traces + per-phase wall timing
(the reference's only perf instrumentation is a time.time() mean,
easykv.py:507-528)."""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, List


@contextlib.contextmanager
def profile_trace(logdir: str) -> Iterator[None]:
    """Capture a TensorBoard-viewable device trace around a block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class step_timer:
    """Collects per-step wall latencies; mean excludes the first (warm-up)
    step like the reference (easykv.py:528)."""

    def __init__(self) -> None:
        self.times: List[float] = []
        self._t0 = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean(self) -> float:
        body = self.times[1:] or self.times
        return sum(body) / max(len(body), 1)
