"""Quaternion utilities (pure jnp, batched).

Parity target: reference ``rasterize.py:41-56`` (quaternion -> rotation
matrix, w-first convention) and the L2 normalization of learned quaternions
at ``rasterize.py:112``.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_quaternion(q: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """L2-normalize quaternions along the last axis.

    Learned quaternions carry no unit-norm guarantee, so they are normalized
    before use (reference rasterize.py:111-112 uses p=2 normalization with
    torch's default eps clamp of 1e-12 on the norm).
    """
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, jnp.maximum(eps, 1e-12))


def quaternion_to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Convert unit quaternions ``[..., 4]`` (w, x, y, z) to ``[..., 3, 3]``
    rotation matrices.

    Matches reference rasterize.py:41-56 (same algebra, batched over leading
    axes instead of a trailing batch axis).
    """
    w = q[..., 0]
    x = q[..., 1]
    y = q[..., 2]
    z = q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        axis=-1,
    )
    row1 = jnp.stack(
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        axis=-1,
    )
    row2 = jnp.stack(
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        axis=-1,
    )
    return jnp.stack([row0, row1, row2], axis=-2)
