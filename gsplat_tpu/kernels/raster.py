"""Differentiable tile rasterization: custom_vjp over the kernel pair.

``rasterize_tiles`` is the single entry point every renderer uses. It works
at tile level (explicit global ``tile_ids``, per-tile output slabs) so a
shard_map shard can rasterize its slice of the framebuffer; image assembly
(``render.tile_jnp.tiles_to_image``) happens outside and is differentiated
by plain autodiff.

Dispatch: Pallas kernels compiled on TPU, the pure-jnp tile implementations
elsewhere (CPU tests / debugging). The custom VJP routes gradients to the
packed per-gaussian features (means, conics, opacity, rgb) — from which
autodiff continues through the preprocess to the raw parameters
(means/log-scales/quats/opacity-logits/SH), exactly the gradient surface
BASELINE.json requires. Binning indices are non-differentiable (as in the
original CUDA design: no gradient flows through tile assignment).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.config import RasterConfig


def _use_pallas(cfg: RasterConfig) -> bool:
    return cfg.use_pallas and (
        jax.default_backend() == "tpu" or cfg.force_pallas_interpret
    )


def _forward_impl(feat, pair_gaussian, tile_start, tile_count, tile_ids, n_tiles_x, cfg,
                  pair_feat=None, width=0, height=0):
    """Returns (color, trans, blocks_done, pair_feat). ``blocks_done`` [T]
    int32 is how many feature blocks each tile composited before early
    termination (== all blocks for the jnp path / when early stop is off);
    ``pair_feat`` is the dense per-pair feature block array (None on the jnp
    path) — passed in when binning already produced it (the sort-carried
    fused path, ops/binning.py), else gathered here — and saved as a
    residual so the backward does not repeat the multi-M-row gather (disable
    with ``cfg.share_pair_feat=False`` to trade the gather back for
    peak-HBM headroom)."""
    if _use_pallas(cfg):
        from gsplat_tpu.kernels.raster_fwd import build_pair_feat, forward_tiles_pallas

        if pair_feat is None:
            pair_feat = build_pair_feat(feat, pair_gaussian, cfg.pair_block)
        color, trans, blocks_done = forward_tiles_pallas(
            feat, pair_gaussian, tile_start, tile_count, tile_ids, n_tiles_x,
            cfg, interpret=cfg.force_pallas_interpret, pair_feat=pair_feat,
            width=width, height=height,
        )
        if not cfg.share_pair_feat:
            pair_feat = None
        return color, trans, blocks_done, pair_feat
    from gsplat_tpu.render.tile_jnp import forward_tiles_jnp

    color, trans = forward_tiles_jnp(
        feat, pair_gaussian, tile_start, tile_count, tile_ids, n_tiles_x, cfg
    )
    return color, trans, -(-tile_count // cfg.pair_block), None


def _backward_impl(
    feat, pair_gaussian, tile_start, tile_count, tile_ids,
    color_tiles, trans_tiles, g_color, g_trans, blocks_done, gaussian_counts,
    n_tiles_x, cfg, pair_feat=None,
):
    if _use_pallas(cfg):
        from gsplat_tpu.kernels.raster_bwd import backward_tiles_pallas

        return backward_tiles_pallas(
            feat, pair_gaussian, tile_start, tile_count, tile_ids,
            color_tiles, trans_tiles, g_color, g_trans, n_tiles_x, cfg,
            blocks_done=blocks_done, gaussian_counts=gaussian_counts,
            interpret=cfg.force_pallas_interpret, pair_feat=pair_feat,
        )
    from gsplat_tpu.render.tile_jnp import backward_tiles_jnp

    return backward_tiles_jnp(
        feat, pair_gaussian, tile_start, tile_count, tile_ids,
        color_tiles, trans_tiles, g_color, g_trans, n_tiles_x, cfg,
    )


def rasterize_tiles(
    feat: jnp.ndarray,
    pair_gaussian: jnp.ndarray,
    tile_start: jnp.ndarray,
    tile_count: jnp.ndarray,
    tile_ids: jnp.ndarray,
    gaussian_counts: jnp.ndarray,
    n_tiles_x: int,
    cfg: RasterConfig,
    pair_feat_i32: jnp.ndarray | None = None,
    width: int = 0,
    height: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Composite binned gaussians into per-tile pixel slabs.

    Args:
      feat: ``[N+1, 16]`` packed per-gaussian features (ops.binning).
      pair_gaussian / tile_start / tile_count: binning result (chunk-aligned).
      tile_ids: ``[T]`` global tile indices to rasterize.
      gaussian_counts: ``[N]`` kept pairs per gaussian in id order
        (binning); drives the backward's sort-based gradient reduction.
      n_tiles_x, cfg: static.
      pair_feat_i32: optional ``[nblk, 16, pair_block]`` int32 — the dense
        per-pair feature blocks bitcast to int32, when binning already
        produced them via the fused sort-carried path (ops/binning.py
        ``feat_rows=``). int32 so it is non-differentiable by construction:
        its values are a pure re-layout of ``feat`` rows, and the backward
        already routes the WHOLE feature gradient through ``d_feat`` (the
        sort-based reduction is the exact adjoint of that re-layout) — an
        f32 input here would double-count through the sort's autodiff.
    Returns:
      (color ``[T, npix, 3]``, transmittance ``[T, npix]``).
    """
    if pair_feat_i32 is None:
        pair_feat_i32 = jnp.zeros((0,), jnp.int32)  # absent sentinel
    return _rasterize_tiles(
        feat, pair_gaussian, tile_start, tile_count, tile_ids,
        gaussian_counts, n_tiles_x, cfg, width, height, pair_feat_i32,
    )


def _bitcast_f32(pair_feat_i32):
    if pair_feat_i32.size == 0:  # static shape: Python-level branch
        return None
    return jax.lax.bitcast_convert_type(pair_feat_i32, jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _rasterize_tiles(
    feat, pair_gaussian, tile_start, tile_count, tile_ids, gaussian_counts,
    n_tiles_x, cfg, width, height, pair_feat_i32,
):
    color, trans, _, _ = _forward_impl(
        feat, pair_gaussian, tile_start, tile_count, tile_ids, n_tiles_x, cfg,
        pair_feat=_bitcast_f32(pair_feat_i32), width=width, height=height,
    )
    return color, trans


def _fwd(feat, pair_gaussian, tile_start, tile_count, tile_ids, gaussian_counts,
         n_tiles_x, cfg, width, height, pair_feat_i32):
    color, trans, blocks_done, pair_feat = _forward_impl(
        feat, pair_gaussian, tile_start, tile_count, tile_ids, n_tiles_x, cfg,
        pair_feat=_bitcast_f32(pair_feat_i32), width=width, height=height,
    )
    residuals = (
        feat, pair_gaussian, tile_start, tile_count, tile_ids,
        gaussian_counts, color, trans, blocks_done, pair_feat,
        jnp.zeros(pair_feat_i32.shape[:1], jnp.int32),  # shape token for the cotangent
    )
    return (color, trans), residuals


def _int_zero_cotangent(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _bwd(n_tiles_x, cfg, width, height, residuals, cotangents):
    (
        feat, pair_gaussian, tile_start, tile_count, tile_ids,
        gaussian_counts, color, trans, blocks_done, pair_feat,
        pf_token,
    ) = residuals
    g_color, g_trans = cotangents
    d_feat = _backward_impl(
        feat, pair_gaussian, tile_start, tile_count, tile_ids,
        color, trans, g_color, g_trans, blocks_done, gaussian_counts,
        n_tiles_x, cfg, pair_feat=pair_feat,
    )
    if pf_token.shape[0] == 0:
        pf_cotangent = np.zeros((0,), dtype=jax.dtypes.float0)
    else:
        nblk = pf_token.shape[0]
        pf_cotangent = np.zeros((nblk, 16, cfg.pair_block), dtype=jax.dtypes.float0)
    return (
        d_feat,
        _int_zero_cotangent(pair_gaussian),
        _int_zero_cotangent(tile_start),
        _int_zero_cotangent(tile_count),
        _int_zero_cotangent(tile_ids),
        _int_zero_cotangent(gaussian_counts),
        pf_cotangent,
    )


_rasterize_tiles.defvjp(_fwd, _bwd)
