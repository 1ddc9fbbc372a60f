"""Profiling and step-timing utilities (SURVEY.md §5.1).

The reference only carried a commented-out ``torch.profiler`` stub
(``models/stonkgs_pretraining.py:239-244``); here tracing is first-class:
``trace()`` wraps ``jax.profiler`` (TensorBoard/Perfetto-compatible dumps),
``StepTimer`` gives rolling step statistics with honest device syncs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling wall-clock statistics per training/inference step.

    NOTE: on tunneled backends ``block_until_ready`` can return before
    execution finishes; pass a scalar from each step's output to ``stop``
    to force a real sync (see bench.py)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        """Mark the start of a timed step."""
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None) -> float:
        """Mark the end of a timed step and record its duration."""
        if sync_value is not None:
            float(np.asarray(sync_value).reshape(-1)[0])
        dt = time.perf_counter() - self._t0
        self._times.append(dt)
        if len(self._times) > self.window:
            self._times.pop(0)
        return dt

    @property
    def mean(self) -> float:
        return float(np.mean(self._times)) if self._times else 0.0

    @property
    def p50(self) -> float:
        return float(np.median(self._times)) if self._times else 0.0

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.mean if self.mean else 0.0
