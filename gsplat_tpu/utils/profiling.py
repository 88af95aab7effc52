"""Profiling & benchmark helpers (SURVEY.md §5.1 — none in the reference).

``timed``/``benchmark_stats`` measure steady-state device time, and
``trace`` wraps ``jax.profiler`` for kernel-level inspection in
Perfetto/TensorBoard.

Fencing: on some backends (notably the tunneled TPU used here)
``jax.block_until_ready`` can return before execution finishes; the only
reliable fence is a device->host fetch, so every timing loop ends by
fetching one element of one output leaf (a 4-byte transfer).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import numpy as np


def _fence(result):
    """Block until `result` is actually computed (device->host fetch)."""
    leaves = jax.tree_util.tree_leaves(result)
    for leaf in leaves:
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])
            break
    return result


def timed(fn: Callable, *args, warmup: int = 2, iters: int = 10, **kwargs):
    """Run fn with warmup, return (mean_seconds, last_result)."""
    result = None
    for _ in range(warmup):
        result = _fence(fn(*args, **kwargs))
    start = time.perf_counter()
    for _ in range(iters):
        result = _fence(fn(*args, **kwargs))
    elapsed = (time.perf_counter() - start) / iters
    return elapsed, result


def benchmark_stats(fn: Callable, *args, warmup: int = 2, iters: int = 10, **kwargs) -> Dict[str, float]:
    """Per-iteration timing stats: mean/min/max/p50 in seconds."""
    for _ in range(warmup):
        _fence(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        start = time.perf_counter()
        _fence(fn(*args, **kwargs))
        times.append(time.perf_counter() - start)
    times.sort()
    return {
        "mean_s": sum(times) / len(times),
        "min_s": times[0],
        "max_s": times[-1],
        "p50_s": times[len(times) // 2],
    }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gsplat_tpu_trace"):
    """Capture a jax.profiler trace around a block of device work."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
