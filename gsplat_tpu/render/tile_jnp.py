"""Tile-parallel renderer in pure jnp (XLA), no Pallas.

The production path uses the Pallas kernels in ``gsplat_tpu.kernels``; this
module is the same algorithm expressed with ``vmap`` over tiles and a
``while_loop`` over gaussian chunks. It serves three purposes:
  * a fast-to-compile forward for debugging and CPU-only environments,
  * an independent implementation to cross-check the Pallas kernels,
  * documentation of the compositing algorithm in plain jnp.

Everything here works at *tile level*: functions consume explicit global
``tile_ids`` (so a shard_map shard can rasterize its slice of tiles) and
produce per-tile pixel slabs; ``tiles_to_image``/``image_to_tiles`` convert
to framebuffer layout.

Algorithm per tile (replacing the reference's sequential per-gaussian loop,
rasterize.py:436-452): walk the tile's depth-ordered pair list in chunks of
``chunk_size``; for each chunk compute every pair's alpha at every tile pixel
(vectorized [chunk, pixels]) and turn the front-to-back recurrence into an
exclusive cumulative product of (1 - alpha) along the chunk axis.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from gsplat_tpu.config import MAX_GAUSSIAN_DENSITY, MIN_ALPHA, RasterConfig
from gsplat_tpu.ops import binning as B
from gsplat_tpu.ops.compositing import gaussian_alpha


def tiles_to_image(
    per_tile: jnp.ndarray, width: int, height: int, tile_size: int
) -> jnp.ndarray:
    """[T, tile_px, C...] -> [H, W, C...] (crops the tile padding)."""
    ts = tile_size
    n_tiles_x = -(-width // ts)
    n_tiles_y = -(-height // ts)
    trailing = per_tile.shape[2:]
    x = per_tile.reshape(n_tiles_y, n_tiles_x, ts, ts, *trailing)
    x = jnp.moveaxis(x, 2, 1).reshape(n_tiles_y * ts, n_tiles_x * ts, *trailing)
    return x[:height, :width]


def image_to_tiles(image: jnp.ndarray, tile_size: int) -> jnp.ndarray:
    """[H, W, C...] -> [T, tile_px, C...] (zero-pads to tile multiples)."""
    ts = tile_size
    h, w = image.shape[:2]
    n_tiles_x = -(-w // ts)
    n_tiles_y = -(-h // ts)
    pad = [(0, n_tiles_y * ts - h), (0, n_tiles_x * ts - w)] + [(0, 0)] * (image.ndim - 2)
    x = jnp.pad(image, pad)
    x = x.reshape(n_tiles_y, ts, n_tiles_x, ts, *image.shape[2:])
    x = jnp.moveaxis(x, 1, 2).reshape(n_tiles_y * n_tiles_x, ts * ts, *image.shape[2:])
    return x


def _tile_pixel_coords(tile_id, n_tiles_x: int, tile_size: int, dtype):
    """Row-major pixel coordinates of one tile: ([npix], [npix])."""
    ts = tile_size
    tx = tile_id % n_tiles_x
    ty = tile_id // n_tiles_x
    lin = jnp.arange(ts * ts, dtype=jnp.int32)
    px = (tx * ts + lin % ts).astype(dtype)
    py = (ty * ts + lin // ts).astype(dtype)
    return px, py


def _chunk_alphas(feats, lane_mask, px, py) -> jnp.ndarray:
    """Effective alpha of a chunk of pairs at each tile pixel: [C, P]."""
    fcol = lambda i: feats[:, i][:, None]  # [C, 1]
    alpha, valid = gaussian_alpha(
        px[None, :], py[None, :],
        fcol(B.FEAT_MEAN_X), fcol(B.FEAT_MEAN_Y),
        fcol(B.FEAT_CONIC_X), fcol(B.FEAT_CONIC_Y), fcol(B.FEAT_CONIC_XY),
        fcol(B.FEAT_OPACITY),
    )
    inside = (
        (px[None, :] >= fcol(B.FEAT_X_MIN))
        & (px[None, :] < fcol(B.FEAT_X_MAX))
        & (py[None, :] >= fcol(B.FEAT_Y_MIN))
        & (py[None, :] < fcol(B.FEAT_Y_MAX))
    )
    return jnp.where(valid & inside & lane_mask[:, None], alpha, 0.0)


def _render_one_tile(tile_id, feat, pair_gaussian, start, count, n_tiles_x, cfg):
    """Composite one tile. Returns (color [P, 3], transmittance [P])."""
    cs = cfg.chunk_size
    npix = cfg.pixels_per_tile
    dtype = feat.dtype
    px, py = _tile_pixel_coords(tile_id, n_tiles_x, cfg.tile_size, dtype)
    lane = jnp.arange(cs, dtype=jnp.int32)

    def cond(state):
        c, color, trans = state
        not_done = c * cs < count
        if cfg.early_stop_transmittance > 0.0:
            not_done &= jnp.max(trans) > cfg.early_stop_transmittance
        return not_done

    def body(state):
        c, color, trans = state
        idx = jax.lax.dynamic_slice(pair_gaussian, (start + c * cs,), (cs,))
        feats = feat[idx]  # [C, 16]
        lane_mask = (c * cs + lane) < count
        a = _chunk_alphas(feats, lane_mask, px, py)  # [C, P]
        one_minus = 1.0 - a
        cum = jnp.cumprod(one_minus, axis=0)
        t_excl = jnp.concatenate([jnp.ones((1, npix), dtype), cum[:-1]], axis=0)
        w = a * t_excl * trans[None, :]  # [C, P]
        rgb = feats[:, B.FEAT_R : B.FEAT_B + 1]  # [C, 3]
        color = color + jnp.einsum("cp,ck->pk", w, rgb, precision="highest")
        trans = trans * cum[-1]
        return c + 1, color, trans

    color0 = jnp.zeros((npix, 3), dtype)
    trans0 = jnp.ones((npix,), dtype)
    _, color, trans = jax.lax.while_loop(cond, body, (jnp.int32(0), color0, trans0))
    return color, trans


@partial(jax.jit, static_argnames=("n_tiles_x", "cfg"))
def forward_tiles_jnp(
    feat: jnp.ndarray,
    pair_gaussian: jnp.ndarray,
    tile_start: jnp.ndarray,
    tile_count: jnp.ndarray,
    tile_ids: jnp.ndarray,
    n_tiles_x: int,
    cfg: RasterConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rasterize the given tiles. Returns (color [T, npix, 3], trans [T, npix])."""
    pad = jnp.full((cfg.chunk_size,), feat.shape[0] - 1, dtype=pair_gaussian.dtype)
    pair_gaussian = jnp.concatenate([pair_gaussian, pad])
    return jax.vmap(
        lambda t, s, c: _render_one_tile(t, feat, pair_gaussian, s, c, n_tiles_x, cfg)
    )(tile_ids, tile_start, tile_count)


def _backward_one_tile(
    tile_id, feat, pair_gaussian, start, count,
    c_total, t_final, g_color, g_trans,
    n_tiles_x: int, max_chunks: int, cfg: RasterConfig,
):
    """Gradient walk for one tile, *front-to-back* (same direction and
    numerics as the forward).

    The classic CUDA backward walks back-to-front dividing the transmittance
    by (1 - alpha) at every step, which underflows once T has collapsed.
    Walking forward instead, the suffix color a pair occludes is
    ``S_k = C_total - C_front_k - contrib_k`` — every term is a forward
    quantity, and the only division is by ``1 - alpha >= 0.01`` (alpha is
    clamped at 0.99, rasterize.py:285-288). dC/d(alpha_k) = rgb_k * T_k -
    S_k / (1 - a_k); dT_final/d(alpha_k) = -T_final / (1 - a_k).

    Returns (pair_indices [max_chunks*C], pair_grads [max_chunks*C, 16]).
    """
    cs = cfg.chunk_size
    npix = cfg.pixels_per_tile
    dtype = feat.dtype
    px, py = _tile_pixel_coords(tile_id, n_tiles_x, cfg.tile_size, dtype)
    lane = jnp.arange(cs, dtype=jnp.int32)

    def step(carry, c):
        trans, c_front = carry  # [P], [P, 3]
        idx = jax.lax.dynamic_slice(pair_gaussian, (start + c * cs,), (cs,))
        feats = feat[idx]
        lane_mask = (c * cs + lane) < count
        fcol = lambda i: feats[:, i][:, None]
        mean_x, mean_y = fcol(B.FEAT_MEAN_X), fcol(B.FEAT_MEAN_Y)
        cx, cy, cxy = fcol(B.FEAT_CONIC_X), fcol(B.FEAT_CONIC_Y), fcol(B.FEAT_CONIC_XY)
        opac = fcol(B.FEAT_OPACITY)
        rgb = feats[:, B.FEAT_R : B.FEAT_B + 1]  # [C, 3]

        dx = mean_x - px[None, :]
        dy = mean_y - py[None, :]
        density = -0.5 * (cx * dx * dx + cy * dy * dy) - cxy * dx * dy
        expd = jnp.exp(density)
        raw = opac * expd
        alpha = jnp.minimum(raw, MAX_GAUSSIAN_DENSITY)
        inside = (
            (px[None, :] >= fcol(B.FEAT_X_MIN))
            & (px[None, :] < fcol(B.FEAT_X_MAX))
            & (py[None, :] >= fcol(B.FEAT_Y_MIN))
            & (py[None, :] < fcol(B.FEAT_Y_MAX))
        )
        valid = (alpha > MIN_ALPHA) & (density <= 0.0) & inside & lane_mask[:, None]
        a = jnp.where(valid, alpha, 0.0)  # [C, P]

        one_minus = 1.0 - a
        cum = jnp.cumprod(one_minus, axis=0)
        t_excl = jnp.concatenate([jnp.ones((1, npix), dtype), cum[:-1]], axis=0)
        t_k = t_excl * trans[None, :]  # transmittance in front of each pair
        w = a * t_k  # [C, P]
        wc = w[:, :, None] * rgb[:, None, :]  # [C, P, 3]
        cum_wc = jnp.cumsum(wc, axis=0)
        c_front_k = c_front[None, :, :] + cum_wc - wc  # exclusive prefix
        s_behind = c_total[None, :, :] - c_front_k - wc  # [C, P, 3]

        inv_one_minus = 1.0 / one_minus
        d_a = jnp.einsum(
            "pk,ck->cp", g_color, rgb, precision="highest"
        ) * t_k - jnp.einsum(
            "cpk,pk->cp", s_behind, g_color, precision="highest"
        ) * inv_one_minus
        d_a = d_a - (g_trans * t_final)[None, :] * inv_one_minus
        d_a = jnp.where(valid, d_a, 0.0)

        unclamped = raw < MAX_GAUSSIAN_DENSITY
        d_raw = jnp.where(unclamped, d_a, 0.0)
        d_opac = jnp.sum(d_raw * expd, axis=1)  # [C]
        d_density = d_raw * raw  # [C, P]
        d_mean_x = jnp.sum(d_density * -(cx * dx + cxy * dy), axis=1)
        d_mean_y = jnp.sum(d_density * -(cy * dy + cxy * dx), axis=1)
        d_cx = jnp.sum(d_density * (-0.5 * dx * dx), axis=1)
        d_cy = jnp.sum(d_density * (-0.5 * dy * dy), axis=1)
        d_cxy = jnp.sum(d_density * (-dx * dy), axis=1)
        d_rgb = jnp.einsum("cp,pk->ck", w, g_color, precision="highest")  # [C, 3]

        grads = jnp.zeros((cs, feat.shape[-1]), dtype)
        grads = grads.at[:, B.FEAT_MEAN_X].set(d_mean_x)
        grads = grads.at[:, B.FEAT_MEAN_Y].set(d_mean_y)
        grads = grads.at[:, B.FEAT_CONIC_X].set(d_cx)
        grads = grads.at[:, B.FEAT_CONIC_Y].set(d_cy)
        grads = grads.at[:, B.FEAT_CONIC_XY].set(d_cxy)
        grads = grads.at[:, B.FEAT_OPACITY].set(d_opac)
        grads = grads.at[:, B.FEAT_R : B.FEAT_B + 1].set(d_rgb)
        grads = jnp.where(lane_mask[:, None], grads, 0.0)

        trans = trans * cum[-1]
        c_front = c_front + cum_wc[-1]
        return (trans, c_front), (idx, grads)

    trans0 = jnp.ones((npix,), dtype)
    cfront0 = jnp.zeros((npix, 3), dtype)
    _, (idxs, grads) = jax.lax.scan(
        step, (trans0, cfront0), jnp.arange(max_chunks, dtype=jnp.int32)
    )
    return idxs.reshape(-1), grads.reshape(-1, feat.shape[-1])


@partial(jax.jit, static_argnames=("n_tiles_x", "cfg"))
def backward_tiles_jnp(
    feat: jnp.ndarray,
    pair_gaussian: jnp.ndarray,
    tile_start: jnp.ndarray,
    tile_count: jnp.ndarray,
    tile_ids: jnp.ndarray,
    color_tiles: jnp.ndarray,
    trans_tiles: jnp.ndarray,
    g_color: jnp.ndarray,
    g_trans: jnp.ndarray,
    n_tiles_x: int,
    cfg: RasterConfig,
) -> jnp.ndarray:
    """Pure-jnp gradient of :func:`forward_tiles_jnp` w.r.t. ``feat``.

    Every tile scans a *static* ``ceil(max_pairs / chunk)`` chunks (masked
    past its count), so this is O(T * max_pairs) — fine for tests and small
    scenes; the Pallas backward kernel is the production path.
    """
    max_chunks = -(-pair_gaussian.shape[0] // cfg.chunk_size)
    pad = jnp.full((cfg.chunk_size,), feat.shape[0] - 1, dtype=pair_gaussian.dtype)
    pair_gaussian_p = jnp.concatenate([pair_gaussian, pad])

    idxs, grads = jax.vmap(
        lambda t, s, c, ct, tf, g1, g2: _backward_one_tile(
            t, feat, pair_gaussian_p, s, c, ct, tf, g1, g2,
            n_tiles_x, max_chunks, cfg,
        )
    )(tile_ids, tile_start, tile_count, color_tiles, trans_tiles, g_color, g_trans)

    return jax.ops.segment_sum(
        grads.reshape(-1, feat.shape[-1]),
        idxs.reshape(-1),
        num_segments=feat.shape[0],
    )
