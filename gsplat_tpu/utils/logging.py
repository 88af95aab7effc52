"""Structured logging (reference C21, rasterize.py:19-24 — but scoped).

The reference configures the *root* logger at NOTSET, which turns on debug
output for every library in the process. Here the configuration is scoped to
the ``gsplat_tpu`` logger, uses the same pathname:lineno format, and is
host-0-only under multi-host runs (SURVEY.md §5.5)."""

from __future__ import annotations

import logging

import jax

_FORMAT = "[%(asctime)s] %(levelname)s [%(pathname)s:%(lineno)d] - %(message)s"
_DATEFMT = "%m-%d %H:%M:%S"


def get_logger(name: str = "gsplat_tpu", level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FORMAT, datefmt=_DATEFMT))
        logger.addHandler(handler)
        logger.propagate = False
    # Host-0-only output on multi-host jobs.
    logger.setLevel(level if jax.process_index() == 0 else logging.ERROR)
    return logger


def log_metrics(logger: logging.Logger, step: int, metrics: dict) -> None:
    parts = " ".join(f"{k}={float(v):.5g}" for k, v in sorted(metrics.items()))
    logger.info("step=%d %s", step, parts)
