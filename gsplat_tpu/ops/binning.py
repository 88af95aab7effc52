"""Tile binning: turn per-gaussian bboxes into per-tile, depth-ordered lists.

This replaces the reference's sequential per-gaussian Python loop
(rasterize.py:440-452) with the tile-parallel formulation the original CUDA
rasterizer uses — but with *static shapes throughout*, which is what XLA/TPU
require (SURVEY.md §7 hard part #1). The recipe:

  1. Depth-sort gaussians (rasterize.py:424-425; ascending camera-z so tiles
     composite front-to-back).
  2. Each active gaussian covers ``count = ntx * nty`` tiles (from its pixel
     bbox). Counts are dynamic, so the classic GPU "duplicate keys" expansion
     is re-done with a fixed-capacity pair buffer: an exclusive cumsum gives
     each gaussian's segment offset, a scatter-add of segment-start markers
     followed by a cumsum recovers, for every pair slot, which gaussian it
     belongs to — all O(P) with static shapes.
  3. Pairs are generated in depth-major order, so a *stable* sort by tile id
     yields, per tile, a contiguous depth-ordered gaussian list. Tile starts
     come from a searchsorted over the sorted keys.

Overflow of the fixed capacity is reported (``num_pairs`` vs ``capacity``)
so callers can re-render with a doubled budget; truncation keeps the closest
(smallest-depth) gaussians, which degrades gracefully.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsplat_tpu.ops.projection import Preprocessed


class TileBinning(NamedTuple):
    """Static-shape binning result for one view.

    Attributes:
      pair_gaussian: ``[max_pairs]`` int32 — for each pair slot, the *global*
        gaussian index it refers to; slots >= num_pairs hold ``num_gaussians``
        (a padding sentinel pointing at zero-padded feature rows).
      tile_start: ``[num_tiles]`` int32 — first pair slot of each tile.
      tile_count: ``[num_tiles]`` int32 — number of pairs in each tile.
      num_pairs: scalar int32 — pairs actually generated (<= capacity unless
        overflowed; compare with ``capacity`` to detect truncation).
      depth_order: ``[N]`` int32 — gaussian indices sorted by camera depth.
    """

    pair_gaussian: jnp.ndarray
    tile_start: jnp.ndarray
    tile_count: jnp.ndarray
    num_pairs: jnp.ndarray
    depth_order: jnp.ndarray


def tile_ranges(bbox: jnp.ndarray, tile_size: int, n_tiles_x: int, n_tiles_y: int):
    """Tile-index ranges covered by each half-open pixel bbox.

    Returns (tx0, ty0, ntx, nty) — all ``[N]`` int32; empty bboxes give 0
    counts. ``x_max`` is exclusive (the reference's meshgrid is
    ``arange(x_min, x_max)``, rasterize.py:271-272).
    """
    x_min, y_min, x_max, y_max = bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3]
    tx0 = jnp.clip(x_min // tile_size, 0, n_tiles_x - 1)
    ty0 = jnp.clip(y_min // tile_size, 0, n_tiles_y - 1)
    tx1 = jnp.clip((x_max - 1) // tile_size, 0, n_tiles_x - 1)
    ty1 = jnp.clip((y_max - 1) // tile_size, 0, n_tiles_y - 1)
    empty = (x_max <= x_min) | (y_max <= y_min)
    ntx = jnp.where(empty, 0, tx1 - tx0 + 1)
    nty = jnp.where(empty, 0, ty1 - ty0 + 1)
    return tx0.astype(jnp.int32), ty0.astype(jnp.int32), ntx.astype(jnp.int32), nty.astype(jnp.int32)


def bin_gaussians(
    prep: Preprocessed,
    width: int,
    height: int,
    tile_size: int,
    max_pairs: int,
    align: int = 1,
) -> TileBinning:
    """Build per-tile depth-ordered gaussian lists (static shapes).

    With ``align > 1`` every tile's pair segment starts at a multiple of
    ``align`` and is padded up to one with sentinel pairs. The Pallas kernels
    require this: their chunked DMA reads/writes then never cross a tile
    boundary (the backward writes whole per-chunk gradient slabs to HBM, and
    un-aligned tails would race with the next tile's rows). Sentinel pairs
    point at the zero feature row, whose empty bbox contributes exactly
    nothing — so the kernels need no per-lane masking at all.
    """
    n = prep.depth.shape[0]
    n_tiles_x = -(-width // tile_size)
    n_tiles_y = -(-height // tile_size)
    num_tiles = n_tiles_x * n_tiles_y

    # 1. Depth order (stable argsort; ascending camera z => front-to-back).
    depth_order = jnp.argsort(prep.depth).astype(jnp.int32)

    tx0, ty0, ntx, nty = tile_ranges(prep.bbox, tile_size, n_tiles_x, n_tiles_y)
    counts = jnp.where(prep.active, ntx * nty, 0).astype(jnp.int32)

    # Reorder per-gaussian binning data by depth so pair slots come out
    # depth-major.
    counts_d = counts[depth_order]
    tx0_d = tx0[depth_order]
    ty0_d = ty0[depth_order]
    ntx_d = ntx[depth_order]

    offsets = jnp.cumsum(counts_d) - counts_d  # exclusive prefix sum
    num_pairs = jnp.minimum(offsets[-1] + counts_d[-1], max_pairs).astype(jnp.int32)

    # 2. Segment-start markers -> pair slot -> depth-rank of owning gaussian.
    #    Scatter each nonempty segment's *depth rank* at its start offset and
    #    propagate with a cumulative max. (A cumsum of +1 markers would count
    #    only nonempty segments and mis-rank everything after a zero-count
    #    gaussian — zero-count gaussians are the common case: culled /
    #    offscreen splats.) Ranks are monotone along the buffer, so cummax
    #    recovers the owning rank exactly; mode=drop ignores segments
    #    starting past capacity.
    rank_iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    markers = jnp.zeros((max_pairs,), dtype=jnp.int32)
    starts = jnp.where(counts_d > 0, offsets, max_pairs)  # drop empty segments
    markers = markers.at[starts].max(rank_iota, mode="drop")
    pair_rank = jax.lax.cummax(markers)  # [max_pairs], depth rank per slot

    slot = jax.lax.broadcasted_iota(jnp.int32, (max_pairs, 1), 0).squeeze(-1)
    valid = slot < num_pairs
    pair_rank = jnp.where(valid, pair_rank, 0)

    local = slot - offsets[pair_rank]
    w = jnp.maximum(ntx_d[pair_rank], 1)
    tile_x = tx0_d[pair_rank] + local % w
    tile_y = ty0_d[pair_rank] + local // w
    tile_id = jnp.where(valid, tile_y * n_tiles_x + tile_x, num_tiles)

    # 3. Stable sort by tile id; ties keep depth-major generation order.
    order = jnp.argsort(tile_id, stable=True)
    sorted_tile_id = tile_id[order]
    pair_gaussian = jnp.where(
        valid[order], depth_order[pair_rank[order]], jnp.int32(n)
    )

    tile_idx = jax.lax.broadcasted_iota(jnp.int32, (num_tiles, 1), 0).squeeze(-1)
    tile_start = jnp.searchsorted(sorted_tile_id, tile_idx, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(sorted_tile_id, tile_idx, side="right").astype(jnp.int32)
    tile_count = tile_end - tile_start

    if align > 1:
        # Re-scatter pairs into per-tile segments padded to `align`.
        aligned_count = -(-tile_count // align) * align
        aligned_start = (jnp.cumsum(aligned_count) - aligned_count).astype(jnp.int32)
        slot_pos = jax.lax.broadcasted_iota(jnp.int32, (max_pairs, 1), 0).squeeze(-1)
        in_range = sorted_tile_id < num_tiles
        tid = jnp.minimum(sorted_tile_id, num_tiles - 1)
        new_pos = aligned_start[tid] + (slot_pos - tile_start[tid])
        new_pos = jnp.where(in_range, new_pos, max_pairs)  # drop sentinels
        aligned_pairs = jnp.full((max_pairs,), jnp.int32(n))
        aligned_pairs = aligned_pairs.at[new_pos].set(pair_gaussian, mode="drop")
        pair_gaussian = aligned_pairs
        tile_start = aligned_start
        # On capacity overflow the tail tiles lose (some of) their segment;
        # clamp counts so kernels never read past the buffer.
        tile_count = jnp.clip(
            jnp.minimum(tile_count, max_pairs - aligned_start), 0
        ).astype(jnp.int32)
        num_pairs = jnp.minimum(
            aligned_start[-1] + aligned_count[-1], max_pairs
        ).astype(jnp.int32)

    return TileBinning(
        pair_gaussian=pair_gaussian.astype(jnp.int32),
        tile_start=tile_start,
        tile_count=tile_count,
        num_pairs=num_pairs,
        depth_order=depth_order,
    )


NUM_FEATURES = 16
# Feature column layout for the packed raster-feature array.
FEAT_MEAN_X, FEAT_MEAN_Y = 0, 1
FEAT_CONIC_X, FEAT_CONIC_Y, FEAT_CONIC_XY = 2, 3, 4
FEAT_OPACITY = 5
FEAT_R, FEAT_G, FEAT_B = 6, 7, 8
FEAT_X_MIN, FEAT_Y_MIN, FEAT_X_MAX, FEAT_Y_MAX = 9, 10, 11, 12


def pack_features(prep: Preprocessed) -> jnp.ndarray:
    """Pack per-gaussian raster features into one ``[N+1, 16]`` row-major
    array: (mean_x, mean_y, conic_x/y/xy, opacity, r, g, b, bbox x4, pad x3).

    The bbox rides along because the reference evaluates *only* pixels inside
    a gaussian's bbox (rasterize.py:271-275): at the 3-sigma bbox edge the
    tail alpha can still exceed MIN_ALPHA, so containment is part of the
    coverage semantics, not just an optimization.

    Row ``N`` is the zero padding row that pair sentinels point at (empty
    bbox => no containment => contributes exactly nothing). 16 floats/row
    keeps gathers lane-aligned on TPU.
    """
    feat = jnp.concatenate(
        [
            prep.screen_means,
            prep.conics,
            prep.opacity[:, None],
            prep.rgb,
            prep.bbox.astype(prep.screen_means.dtype),
            jnp.zeros((prep.depth.shape[0], 3), dtype=prep.screen_means.dtype),
        ],
        axis=-1,
    )
    pad = jnp.zeros((1, feat.shape[-1]), dtype=feat.dtype)
    return jnp.concatenate([feat, pad], axis=0)
