"""Differentiable tile rasterization: custom_vjp over the kernel pair.

``rasterize_pairs`` is the single entry point every renderer uses. It
dispatches between the Pallas TPU kernels (production) and the pure-jnp
tile implementations (CPU/tests) and defines the custom VJP so gradients
flow to the packed per-gaussian features (means, conics, opacity, rgb) —
from which plain autodiff continues through the preprocess to the raw
parameters (means/log-scales/quats/opacity-logits/SH), exactly the gradient
surface BASELINE.json requires. Binning indices are non-differentiable (as
in the original CUDA design: no gradient through tile assignment).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.config import RasterConfig


def _use_pallas(cfg: RasterConfig) -> bool:
    return cfg.use_pallas and jax.default_backend() == "tpu"


def _forward_impl(feat, pair_gaussian, tile_start, tile_count, width, height, cfg):
    if _use_pallas(cfg):
        from gsplat_tpu.kernels.raster_fwd import forward_tiles_pallas

        return forward_tiles_pallas(
            feat, pair_gaussian, tile_start, tile_count, width, height, cfg
        )
    from gsplat_tpu.render.tile_jnp import forward_tiles

    return forward_tiles(feat, pair_gaussian, tile_start, tile_count, width, height, cfg)


def _backward_impl(
    feat, pair_gaussian, tile_start, tile_count, image, trans, g_image, g_trans,
    width, height, cfg,
):
    if _use_pallas(cfg):
        from gsplat_tpu.kernels.raster_bwd import backward_tiles_pallas

        return backward_tiles_pallas(
            feat, pair_gaussian, tile_start, tile_count, image, trans,
            g_image, g_trans, width, height, cfg,
        )
    from gsplat_tpu.render.tile_jnp import backward_tiles

    return backward_tiles(
        feat, pair_gaussian, tile_start, tile_count, image, trans,
        g_image, g_trans, width, height, cfg,
    )


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def rasterize_pairs(
    feat: jnp.ndarray,
    pair_gaussian: jnp.ndarray,
    tile_start: jnp.ndarray,
    tile_count: jnp.ndarray,
    width: int,
    height: int,
    cfg: RasterConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Composite binned gaussians into an image.

    Args:
      feat: ``[N+1, 16]`` packed per-gaussian features (ops.binning).
      pair_gaussian / tile_start / tile_count: binning result.
      width, height, cfg: static.
    Returns:
      (image ``[H, W, 3]``, transmittance ``[H, W]``).
    """
    return _forward_impl(feat, pair_gaussian, tile_start, tile_count, width, height, cfg)


def _fwd(feat, pair_gaussian, tile_start, tile_count, width, height, cfg):
    image, trans = _forward_impl(
        feat, pair_gaussian, tile_start, tile_count, width, height, cfg
    )
    residuals = (feat, pair_gaussian, tile_start, tile_count, image, trans)
    return (image, trans), residuals


def _int_zero_cotangent(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _bwd(width, height, cfg, residuals, cotangents):
    feat, pair_gaussian, tile_start, tile_count, image, trans = residuals
    g_image, g_trans = cotangents
    d_feat = _backward_impl(
        feat, pair_gaussian, tile_start, tile_count, image, trans,
        g_image, g_trans, width, height, cfg,
    )
    return (
        d_feat,
        _int_zero_cotangent(pair_gaussian),
        _int_zero_cotangent(tile_start),
        _int_zero_cotangent(tile_count),
    )


rasterize_pairs.defvjp(_fwd, _bwd)
