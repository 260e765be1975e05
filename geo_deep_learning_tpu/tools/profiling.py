"""Profiling and step-timing subsystem.

The reference has NO profiling support (SURVEY.md §5: "none in-repo");
this framework must prove patches/sec/chip targets, so profiling is
first-class:

- :class:`StepTimer` — streaming per-step wall-time stats with warmup
  exclusion (compile steps would poison means).
- :func:`trace` — context manager around ``jax.profiler`` trace capture;
  the output directory opens in TensorBoard/XProf or Perfetto.
- :func:`annotate` — named trace regions (``jax.profiler.TraceAnnotation``)
  so host phases (data wait vs step dispatch) are attributable.
- :func:`device_memory_stats` — live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class StepTimer:
    warmup: int = 2
    times: list[float] = field(default_factory=list)
    _t0: float | None = None
    _seen: int = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)
        return dt

    @contextlib.contextmanager
    def step(self):
        self.start()
        yield
        self.stop()

    def summary(self, items_per_step: int = 1) -> dict[str, float]:
        if not self.times:
            return {}
        import numpy as np

        arr = np.asarray(self.times)
        return {
            "steps_timed": len(arr),
            "mean_step_s": float(arr.mean()),
            "p50_step_s": float(np.percentile(arr, 50)),
            "p95_step_s": float(np.percentile(arr, 95)),
            "items_per_sec": float(items_per_step / arr.mean()),
        }


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2):
    """Capture a device+host profile under ``log_dir``."""
    jax.profiler.start_trace(log_dir, create_perfetto_trace=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in the trace viewer."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> list[dict]:
    """Per-device memory stats where the backend exposes them."""
    out = []
    for d in jax.devices():
        stats = {}
        try:
            stats = d.memory_stats() or {}
        except (RuntimeError, AttributeError):
            pass
        out.append(
            {
                "device": str(d),
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
        )
    return out
