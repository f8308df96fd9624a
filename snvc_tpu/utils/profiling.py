"""Profiling and observability.

The reference has no tracing at all (SURVEY.md §5); TPU-side we expose
jax.profiler traces (Perfetto/XProf-compatible), per-step timing, and
device memory statistics.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: str = "profiles"):
    """Capture a device trace viewable in XProf/Perfetto."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    """Per-device memory statistics in MiB (where the backend reports them)."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
        except Exception:
            s = {}
        out[str(d)] = {
            k: v / (1 << 20)
            for k, v in s.items()
            if isinstance(v, (int, float)) and "bytes" in k
        }
    return out


class StepTimer:
    """Rolling step timing + JSONL emission (tensorboard-free)."""

    def __init__(self, path: Optional[str] = None, window: int = 50):
        self.path = path
        self.window = window
        self._times = []
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def mean_step_seconds(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    def log(self, step: int, extra: Optional[Dict] = None):
        if not self.path:
            return
        rec = {"step": step, "step_seconds": self.mean_step_seconds}
        if extra:
            rec.update(extra)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
