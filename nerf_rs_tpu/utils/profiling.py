"""Profiling helpers: jax.profiler traces + throughput accounting.

The reference has no tracing at all (SURVEY §5.1 — println in hot
loops). Here: ``trace(log_dir)`` context manager dumps a
TensorBoard/Perfetto-viewable trace, and Throughput tracks the metrics
of record (rays/sec/chip, ray-samples/sec/chip, step time).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile the enclosed steps into ``{log_dir}/plugins/profile``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Windowed throughput over train steps."""

    def __init__(self, num_rays: int, num_samples: int, num_chips: int = 1):
        self.num_rays = num_rays
        self.num_samples = num_samples
        self.num_chips = max(1, num_chips)
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1):
        self._steps += n

    def stats(self) -> Dict[str, float]:
        dt = time.perf_counter() - self._t0
        if dt <= 0 or self._steps == 0:
            return {}
        steps_per_sec = self._steps / dt
        rays_per_sec = steps_per_sec * self.num_rays
        return {
            "step_time_ms": 1000.0 / steps_per_sec,
            "rays_per_sec": rays_per_sec,
            "rays_per_sec_per_chip": rays_per_sec / self.num_chips,
            "samples_per_sec_per_chip": rays_per_sec * self.num_samples / self.num_chips,
        }
