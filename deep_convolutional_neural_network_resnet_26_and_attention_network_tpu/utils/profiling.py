"""Tracing / profiling utilities.

The reference's only profiling artifact is a committed cProfile dump from a
GPU-utilization tuning session (reference:
style-based-gan-pytorch-master-256/100_percent_gpu_utilization.prof) plus
tqdm progress strings. The TPU-native equivalents here:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
    TensorBoard/XProf trace of device execution;
  * ``StepTimer`` — wall-clock per-step timing with warmup skip and
    percentile summary (the train-loop heartbeat);
  * ``annotate(name)`` — named trace span (shows up in the XProf timeline).
"""

import contextlib
import time

import numpy as np

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a trace (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing: ``with timer.step(): ...`` then
    ``timer.summary()`` -> dict of mean/p50/p90 seconds (after warmup)."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times = []
        self._n = 0

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    def summary(self) -> dict:
        if not self.times:
            return {"steps": 0}
        arr = np.asarray(self.times)
        return {
            "steps": int(arr.size),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "total_s": float(arr.sum()),
        }


def memory_stats() -> dict:
    """Per-device live memory (bytes) when the backend exposes it."""
    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            stats[str(d)] = {k: int(v) for k, v in s.items()
                             if "bytes" in k}
        except Exception:
            stats[str(d)] = {}
    return stats
