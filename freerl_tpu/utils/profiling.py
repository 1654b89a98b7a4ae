"""Tracing and per-step timing (SURVEY §5.1: the reference has only
wall-clock prints — DQN_file/DQN.py:286,346).

``trace(logdir)`` wraps a block in a jax.profiler trace viewable in
TensorBoard/Perfetto; ``StepTimer`` tracks steady-state steps/s with warmup
exclusion for honest throughput numbers.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """jax.profiler trace around a block (XLA ops + host timeline)."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Steady-state throughput meter: skips warmup iterations (compile),
    then reports items/s over the measured window."""

    def __init__(self, warmup: int = 2, items_per_step: int = 1):
        self.warmup = warmup
        self.items_per_step = items_per_step
        self.count = 0
        self._t0: Optional[float] = None
        self.measured_steps = 0

    def step(self):
        self.count += 1
        if self.count == self.warmup:
            self._t0 = time.time()
        elif self.count > self.warmup:
            self.measured_steps += 1

    @property
    def items_per_second(self) -> float:
        if self._t0 is None or self.measured_steps == 0:
            return 0.0
        return (
            self.measured_steps * self.items_per_step
            / (time.time() - self._t0)
        )
