"""Profiling and throughput instrumentation.

The reference's only instrumentation is wall-clock ms around ``sess.run``
(ref train_modelnet.py:289-311). TPU-native equivalents: ``jax.profiler``
traces (renderable in TensorBoard/Perfetto) and a host-side throughput
tracker producing the points/sec/chip metric of record (BASELINE.json).

NB on this platform: always sync via a host scalar pull (``float(loss)``),
not ``block_until_ready`` — see .claude/skills/verify/SKILL.md.
"""

from __future__ import annotations

import contextlib
import json
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputTracker:
    """Accumulates step timings and reports points/sec/chip."""

    def __init__(self, points_per_batch: int, num_chips: int = 1):
        self.points_per_batch = points_per_batch
        self.num_chips = max(1, num_chips)
        self.steps = 0
        self.seconds = 0.0
        self._t0 = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        assert self._t0 is not None, "start() not called"
        self.seconds += time.perf_counter() - self._t0
        self.steps += 1
        self._t0 = None

    @contextlib.contextmanager
    def step(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    @property
    def ms_per_step(self) -> float:
        return 1000.0 * self.seconds / max(1, self.steps)

    @property
    def points_per_sec_per_chip(self) -> float:
        if self.seconds == 0:
            return 0.0
        return self.points_per_batch * self.steps / self.seconds / self.num_chips

    def json_line(self, metric: str, baseline: float | None = None) -> str:
        payload = {
            "metric": metric,
            "value": round(self.points_per_sec_per_chip, 1),
            "unit": "points/sec/chip",
        }
        if baseline:
            payload["vs_baseline"] = round(
                self.points_per_sec_per_chip / baseline, 3
            )
        return json.dumps(payload)
