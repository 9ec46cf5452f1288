"""Tracing/profiling utilities (SURVEY.md §5 'Tracing / profiling').

The reference inherits HF's TrainerMemoryTracker/speed_metrics and keeps
PyTorch/XLA metric hooks (src/trainer_seq2seq.py:516-553, 1626-1654). The
TPU-native equivalents:

* `trace(logdir)`      -- jax.profiler trace context (view in TensorBoard /
                          Perfetto); the xm.mark_step/metrics_report analog
* `annotate(name)`     -- TraceAnnotation for named regions
* `StepTimer`          -- wall-clock speed metrics (samples/s, steps/s),
                          matching HF speed_metrics keys
* `device_memory_stats`-- live HBM usage per device (memory tracker analog)
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """speed_metrics equivalent (trainer_seq2seq.py:540-547)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.perf_counter()
        self.steps = 0
        self.samples = 0

    def update(self, n_samples: int):
        self.steps += 1
        self.samples += n_samples

    def metrics(self, prefix: str = "train") -> Dict[str, float]:
        dt = max(time.perf_counter() - self.t0, 1e-9)
        return {
            f"{prefix}_runtime": round(dt, 4),
            f"{prefix}_samples_per_second": round(self.samples / dt, 3),
            f"{prefix}_steps_per_second": round(self.steps / dt, 3),
        }


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, int]:
    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats()
        return {"bytes_in_use": stats.get("bytes_in_use", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
                "bytes_limit": stats.get("bytes_limit", 0)}
    except Exception:
        return {}
