"""Profiling / tracing.

The reference's only instrumentation is a manual perf_counter around train
steps (train_audio_net.py:98,116-117). Here: `jax.profiler` trace capture
(TensorBoard-compatible) plus lightweight per-phase wall timers that land in
the metrics JSONL, so step-time breakdowns ship with every run.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace (view in TensorBoard / Perfetto).

    with profiling.trace('runs/myrun/trace'):
        for _ in range(20): step(...)
    """
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Named wall-clock phases; `summary()` returns mean seconds per phase.

    timer = PhaseTimer()
    with timer.phase('data'):   batch = next(it)
    with timer.phase('step'):   state, m = step(...); jax.block_until_ready(m)
    """

    def __init__(self):
        self._tot: Dict[str, float] = {}
        self._cnt: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._tot[name] = self._tot.get(name, 0.0) + time.perf_counter() - t0
            self._cnt[name] = self._cnt.get(name, 0) + 1

    def summary(self, prefix: str = "time_") -> Dict[str, float]:
        return {f"{prefix}{k}": self._tot[k] / self._cnt[k] for k in self._tot}

    def reset(self) -> None:
        self._tot.clear()
        self._cnt.clear()


def annotate(name: str):
    """TraceAnnotation context for custom named regions in profiles."""
    return jax.profiler.TraceAnnotation(name)
