"""Reliable wall-clock timing on backends where block_until_ready is lazy.

On the tunneled TPU backend, ``jax.block_until_ready`` can return before
execution finishes; the only reliable sync is a device->host fetch. ``timed``
fetches one element of one output leaf every iteration (4-byte transfer).
"""

from __future__ import annotations

import time

import jax
import numpy as np


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    return out


def timed(fn, *args, iters=5, warmup=1):
    for _ in range(warmup):
        out = _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = _sync(fn(*args))
    return (time.perf_counter() - t0) / iters, out
