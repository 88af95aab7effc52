"""Progress feedback for long multi-view / multi-step operations.

The reference shows a tqdm bar over its hot loop (rasterize.py:440); here
the per-gaussian loop is a single device program, so bars go over the
*outer* loops instead: views (orbit / evaluate / bench) and train steps.
tqdm is used when importable, with a plain stderr fallback, and host-0
gating for multi-host runs.
"""

from __future__ import annotations

import sys
from typing import Iterable, Iterator, Sequence, TypeVar

T = TypeVar("T")


def progress(
    items: Sequence[T] | Iterable[T],
    desc: str = "",
    enabled: bool = True,
    total: int | None = None,
) -> Iterator[T]:
    """Wrap an iterable with a progress bar (tqdm if available).

    Disabled (plain pass-through) when ``enabled`` is False or this process
    is not host 0.
    """
    try:
        import jax

        if jax.process_index() != 0:
            enabled = False
    except Exception:  # pragma: no cover - jax always importable here
        pass
    if not enabled:
        yield from items
        return
    try:
        from tqdm import tqdm

        yield from tqdm(items, desc=desc, total=total, file=sys.stderr)
        return
    except ImportError:  # pragma: no cover - tqdm is in the base image
        pass
    if total is None and hasattr(items, "__len__"):
        total = len(items)  # type: ignore[arg-type]
    for i, item in enumerate(items):
        sys.stderr.write(f"\r{desc}: {i + 1}/{total or '?'}")
        sys.stderr.flush()
        yield item
    sys.stderr.write("\n")
