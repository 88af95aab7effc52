"""Alpha-compositing math + a slow, exact, differentiable oracle renderer.

``composite_chunk`` is the shared front-to-back blending rule used by every
renderer in the framework (jnp tile renderer, Pallas kernels, oracle). The
oracle ``render_oracle`` replays the reference's per-gaussian sequential loop
(rasterize.py:436-452, 255-305) as a ``lax.scan`` over depth-sorted
gaussians, evaluating each against the *entire* framebuffer with a bbox
containment mask — O(N * H * W), only for tests/small scenes, but exact and
differentiable via plain autodiff (it is the gradient oracle too).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gsplat_tpu.config import MAX_GAUSSIAN_DENSITY, MIN_ALPHA
from gsplat_tpu.ops.projection import Preprocessed


def gaussian_alpha(
    px: jnp.ndarray,
    py: jnp.ndarray,
    mean_x: jnp.ndarray,
    mean_y: jnp.ndarray,
    conic_x: jnp.ndarray,
    conic_y: jnp.ndarray,
    conic_xy: jnp.ndarray,
    opacity: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel alpha of one (broadcastable batch of) gaussian(s).

    Implements rasterize.py:279-292: quadratic-form log-density with
    ``d = mean - pixel``, ``alpha = min(opacity * exp(density), 0.99)``, and
    the validity gate ``alpha > 1/255 and density <= 0``.

    Returns (alpha, valid_mask); the *effective* alpha is ``alpha * valid``.
    """
    dx = mean_x - px
    dy = mean_y - py
    density = -0.5 * (conic_x * dx * dx + conic_y * dy * dy) - conic_xy * dx * dy
    alpha = jnp.minimum(opacity * jnp.exp(density), MAX_GAUSSIAN_DENSITY)
    valid = (alpha > MIN_ALPHA) & (density <= 0.0)
    return alpha, valid


def render_oracle(
    prep: Preprocessed,
    width: int,
    height: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact-semantics sequential renderer (test oracle).

    Returns (image ``[H, W, 3]``, transmittance ``[H, W]``). Note the
    reference keeps an x-major ``[W, H, 3]`` buffer and transposes for
    display (rasterize.py:437, 449); this returns the display orientation.
    """
    order = jnp.argsort(prep.depth)
    xs = jnp.arange(width, dtype=prep.screen_means.dtype)
    ys = jnp.arange(height, dtype=prep.screen_means.dtype)
    px = xs[None, :]  # [1, W]
    py = ys[:, None]  # [H, 1]

    def step(carry, gidx):
        image, transmittance = carry
        mean_x = prep.screen_means[gidx, 0]
        mean_y = prep.screen_means[gidx, 1]
        cx, cy, cxy = prep.conics[gidx, 0], prep.conics[gidx, 1], prep.conics[gidx, 2]
        opac = prep.opacity[gidx]
        rgb = prep.rgb[gidx]
        bbox = prep.bbox[gidx]
        active = prep.active[gidx]

        alpha, valid = gaussian_alpha(px, py, mean_x, mean_y, cx, cy, cxy, opac)
        inside = (
            (px >= bbox[0])
            & (px < bbox[2])
            & (py >= bbox[1])
            & (py < bbox[3])
        )
        a = jnp.where(valid & inside & active, alpha, 0.0)  # [H, W]
        image = image + (a * transmittance)[..., None] * rgb[None, None, :]
        transmittance = transmittance * (1.0 - a)
        return (image, transmittance), None

    image0 = jnp.zeros((height, width, 3), dtype=prep.screen_means.dtype)
    trans0 = jnp.ones((height, width), dtype=prep.screen_means.dtype)
    (image, transmittance), _ = jax.lax.scan(step, (image0, trans0), order)
    return image, transmittance
