"""Sublane-axis scans for Pallas TPU kernels.

``jnp.cumprod``/``cumsum`` have no Pallas TPU lowering, so the front-to-back
compositing recurrence uses a Hillis-Steele doubling scan along the chunk
(sublane) axis: log2(chunk) shifted multiplies/adds on [chunk, pixels]
arrays, with the shift expressed as a static pad-and-slice (always lowerable).
"""

from __future__ import annotations

import jax.numpy as jnp


def cumprod_inclusive(y: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative product along axis 0 (power-of-two length)."""
    c = y.shape[0]
    s = 1
    while s < c:
        pad = jnp.ones((s,) + y.shape[1:], y.dtype)
        y = y * jnp.concatenate([pad, y[:-s]], axis=0)
        s *= 2
    return y


def cumsum_inclusive(y: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative sum along axis 0 (power-of-two length)."""
    c = y.shape[0]
    s = 1
    while s < c:
        pad = jnp.zeros((s,) + y.shape[1:], y.dtype)
        y = y + jnp.concatenate([pad, y[:-s]], axis=0)
        s *= 2
    return y


def exclusive_from_inclusive(inc: jnp.ndarray, identity: float) -> jnp.ndarray:
    """Shift an inclusive scan down by one, inserting the identity row."""
    top = jnp.full((1,) + inc.shape[1:], identity, inc.dtype)
    return jnp.concatenate([top, inc[:-1]], axis=0)
