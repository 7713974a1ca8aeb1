"""Tracing / profiling hooks.

The reference's observability is wall-clock meters exported to wandb
(SURVEY.md §5); the TPU-native equivalent adds jax.profiler traces
(viewable in TensorBoard / Perfetto) and named scopes around the hot
phases. Enable with cfg.profile_dir or wrap code in ``trace``.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope for profiler timelines (usable as context or decorator)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Traces steps [start, stop) of a loop into log_dir (one-shot)."""

    def __init__(self, log_dir: Optional[str], start: int = 10, stop: int = 15):
        self.log_dir = log_dir
        self.start = start
        self.stop = stop
        self._active = False
        self._done = log_dir is None

    def step(self, i: int):
        if self._done:
            return
        if i == self.start:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif i >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
