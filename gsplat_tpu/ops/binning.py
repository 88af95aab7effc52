"""Tile binning: turn per-gaussian bboxes into per-tile, depth-ordered lists.

This replaces the reference's sequential per-gaussian Python loop
(rasterize.py:440-452) with the tile-parallel formulation the original CUDA
rasterizer uses — but with *static shapes throughout*, which is what XLA/TPU
require (SURVEY.md §7 hard part #1). The recipe (SORTLESS over gaussians —
no O(N) depth sort anywhere):

  1. Each active gaussian covers ``count = ntx * nty`` tiles (from its pixel
     bbox). Counts are dynamic, so the classic GPU "duplicate keys" expansion
     is re-done with a fixed-capacity pair buffer in *gaussian-id order*: an
     exclusive cumsum gives each gaussian's segment offset, a scatter-max of
     segment-start markers followed by a cummax recovers, for every pair
     slot, which gaussian it belongs to — all O(P) with static shapes.
  2. The reference's depth ordering (rasterize.py:424-425; ascending
     camera-z so tiles composite front-to-back) is established by ONE stable
     two-key ``lax.sort`` of the pair buffer by (tile, depth) — per tile,
     a contiguous depth-ordered gaussian list, with (depth, id) ties
     resolving to id order exactly like the reference's stable argsort.
  3. The exact overflow policy (drop the *deepest whole gaussians*: the
     maximal (depth, id)-lexicographic prefix of whole gaussians whose pairs
     fit the capacity) needs only the boundary (depth, id) threshold — found
     by a 63-step binary search over the monotone-uint32 depth encoding and
     then the id space, each step one masked O(N) reduction. This is what
     makes the whole pipeline sortless in N: a handful of O(N) streaming
     passes instead of a multi-operand O(N log N) sort, and the only
     replicated N-scale work a tile shard performs (parallel/shard.py).

Overflow of the fixed capacity is reported (``pair_demand`` vs capacity)
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
      pair_gaussian: ``[max_pairs (+ align pad)]`` int32 — for each pair slot,
        the *global* gaussian index it refers to; unused slots hold
        ``num_gaussians`` (a padding sentinel pointing at zero feature rows).
      tile_start: ``[num_tiles]`` int32 — first pair slot of each tile.
      tile_count: ``[num_tiles]`` int32 — number of pairs in each tile.
      num_pairs: scalar int32 — pairs actually *emitted* into the buffer
        (``sum(gaussian_counts)``; under overflow this is strictly less than
        the demand because whole gaussians are dropped).
      pair_demand: scalar int32 — pairs the view wanted before any capacity
        clipping; ``pair_demand > capacity`` means the buffer overflowed and
        the deepest gaussians were dropped.
      gaussian_counts: ``[N]`` int32 — kept pairs per gaussian in *gaussian id*
        order (the backward's sort-based pair->gaussian gradient reduction
        derives its segment boundaries from this).
    """

    pair_gaussian: jnp.ndarray
    tile_start: jnp.ndarray
    tile_count: jnp.ndarray
    num_pairs: jnp.ndarray
    pair_demand: jnp.ndarray
    gaussian_counts: jnp.ndarray


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


def strided_tile_ranges(
    bbox: jnp.ndarray,
    tile_size: int,
    n_tiles_x: int,
    n_tiles_y: int,
    stride_x: int,
    stride_y: int,
    offset_x,
    offset_y,
):
    """Tile ranges intersected with a 2D-strided tile subset, in *local*
    coordinates.

    A tile shard owns the tiles ``{(tx, ty) : tx ≡ offset_x (mod stride_x),
    ty ≡ offset_y (mod stride_y)}`` — rect coverage stays separable per
    axis, so per-shard binning reuses the whole-frame machinery on the
    local grid ``ceil(n_tiles_x/stride_x) x ceil(n_tiles_y/stride_y)``
    (local index j <-> global index offset + j*stride). Offsets may be
    traced (``lax.axis_index``). Returns (tx0, ty0, ntx, nty) local.
    """
    gx0, gy0, gnx, gny = tile_ranges(bbox, tile_size, n_tiles_x, n_tiles_y)

    def per_axis(a, n, off, stride):
        # local indices j with a <= off + j*stride < a + n:
        # j in [ceil((a-off)/stride), ceil((a+n-off)/stride))
        j0 = -((off - a) // stride)  # ceil((a-off)/stride); >= 0 since a >= 0
        j1 = -((off - a - n) // stride)
        return j0.astype(jnp.int32), jnp.maximum(j1 - j0, 0).astype(jnp.int32)

    lx0, lnx = per_axis(gx0, gnx, offset_x, stride_x)
    ly0, lny = per_axis(gy0, gny, offset_y, stride_y)
    empty = (gnx == 0) | (gny == 0)
    return lx0, ly0, jnp.where(empty, 0, lnx), jnp.where(empty, 0, lny)


def coverage_histogram(
    rects, keep: jnp.ndarray, n_tiles_x: int, n_tiles_y: int
) -> jnp.ndarray:
    """Per-tile covering-gaussian counts via the MXU: rect coverage is
    separable, so ``counts2d = Y^T @ X`` with X/Y the per-axis 0/1 range
    masks (0/1 values: exact in bf16 inputs / f32 accumulation). ``keep``
    gates one factor only — the product needs it once. Masks are built at
    the TIGHT grid dims: XLA pads lanes in VMEM for free, but explicit
    padding (an earlier [N, 128] layout) costs real HBM traffic at N scale
    (SCALING_r04 Amdahl tail). Returns f32 ``[n_tiles_y, n_tiles_x]``.

    Tile shards call this on their own N/tp gaussian slice against the
    GLOBAL grid and psum the [ny, nx] result over the tile axis
    (parallel/shard.py) — the mask-build cost then shrinks with the tile
    factor instead of staying replicated."""
    i32 = jnp.int32
    tx0, ty0, ntx, nty = rects
    txc = jax.lax.broadcasted_iota(i32, (1, n_tiles_x), 1)
    tyc = jax.lax.broadcasted_iota(i32, (1, n_tiles_y), 1)
    x_mask = (
        (txc >= tx0[:, None]) & (txc < (tx0 + ntx)[:, None]) & keep[:, None]
    ).astype(jnp.bfloat16)
    y_mask = (
        (tyc >= ty0[:, None]) & (tyc < (ty0 + nty)[:, None])
    ).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        y_mask, x_mask,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def expand_segments(
    counts: jnp.ndarray,
    num_slots: int,
    cum: jnp.ndarray | None = None,
    window: int | None = None,
    values: tuple = (),
):
    """Decode the contiguous segment layout WITHOUT an N-scale scatter.

    Segments (one per gaussian, ``counts[i]`` pairs each, empties allowed)
    tile ``[0, num_pairs)`` back-to-back in index order. For each pair slot
    ``p`` this returns ``(gid, seg_off)`` with ``gid[p]`` the owning segment
    (= first i with ``cum[i] > p``; empties are never returned) and
    ``seg_off[p] = offsets[gid[p]]`` — so ``local = p - seg_off``. Slots at
    or beyond ``num_pairs`` return arbitrary in-range values; callers mask
    with ``slot < num_pairs`` (exactly the validity the classic marker
    scatter + cummax construction produced).

    Why not the scatter: an XLA/TPU scatter costs ~5 ns per *processed*
    update element regardless of target size (measured: 1M updates into a
    128-slot buffer ≈ 4.7 ms on the v5e), so the classic segment-start
    scatter is an O(N) wall every caller pays — replicated per shard in the
    tile-sharded step, and once per depth slice at 5M gaussians in the
    sliced renderer. This decode is O(P·W) vectorized compares plus tiny
    contiguous row gathers instead:

      1. ``searchsorted`` the 128-slot block boundaries into ``cum`` (a few
         thousand binary-search probes),
      2. row-gather one ``window``-wide aligned strip of ``cum``/``offsets``
         per pair block (contiguous 512 B rows — the cheap gather shape),
      3. per slot, count window entries with ``cum <= p`` (at most 127
         distinct NON-EMPTY segments can start inside a 128-slot block, so
         a window that covers the block's id span bounds the count exactly),
         and one-hot select the owning segment's offset.

    The id span of one pair block is data-dependent (long runs of empty
    segments stretch it), so a too-small ``window`` is detected exactly
    (``gid_hi`` vs the aligned window end, block boundaries clamped to the
    last real pair so trailing empties cannot trigger it) and the whole
    decode falls back to the scatter construction under ``lax.cond`` —
    identical results for every valid slot, so the fast path is a pure
    optimization.

    Args:
      counts: ``[N]`` int32 kept pairs per segment (empties = 0).
      num_slots: static pair-buffer length to decode.
      cum: optional precomputed inclusive cumsum of ``counts`` (callers that
        already have it avoid a second N-scale pass). Must satisfy
        ``cum[i] == sum(counts[:i+1])``.
      window: static window width (rounded up to 128). Default sizes for
        ~4x the uniform-density id span of a 128-slot block.
      values: optional tuple of ``[N]`` int32 per-segment arrays; for each,
        the owning segment's element is returned per slot (``v[gid[p]]``)
        via the same windowed one-hot — callers avoid P-scale narrow
        gathers entirely (narrow gathers cost ~12 ns/element on the v5e).

    Returns: ``(gid, seg_off)`` — each ``[num_slots]`` int32, ``gid`` in
    ``[0, N-1]`` — plus one ``[num_slots]`` array per entry of ``values``.
    """
    n = counts.shape[0]
    i32 = jnp.int32
    if cum is None:
        cum = jnp.cumsum(counts, dtype=i32)
    offsets = cum - counts
    num_pairs = cum[-1]
    nblk = -(-num_slots // 128)
    if window is None:
        window = 512 * n // max(num_slots, 1) + 256
    window = min(_round_up(window, 128), _round_up(n + 1, 128))

    def scatter_all():
        iota_n = jax.lax.broadcasted_iota(i32, (n, 1), 0).squeeze(-1)
        # Keep out-of-bounds (dropped) indices unique too, so the
        # unique_indices fast path's contract holds for every element.
        starts = jnp.where(counts > 0, offsets, num_slots + iota_n)
        m = jnp.zeros((num_slots,), i32).at[starts].max(
            iota_n, mode="drop", unique_indices=True
        )
        gid = jax.lax.cummax(m)
        return gid, offsets[gid], *(v.astype(i32)[gid] for v in values)

    # Static strategy choice: the decode's fused reductions stream
    # ~num_slots x window elements while the scatter costs ~4.7 ns x N
    # regardless of the buffer. Measured crossover on the v5e (fwd+bwd
    # step deltas): decode +13 ms at 1.45M slots x 640 window (N=1M,
    # product 0.93 G), scatter +72 ms better at 2.8M slots x 512 (1.43 G).
    # Past ~1024 ops per scatter-element the decode loses — use the
    # scatter outright (no searchsorted, no window gathers).
    if num_slots * window > 1024 * n:
        return scatter_all()
    wrows = window // 128
    nrows = (n + 127) // 128 + wrows
    big = jnp.int32(2**31 - 1)
    pad = jnp.full((nrows * 128 - n,), big, i32)
    cum2 = jnp.concatenate([cum, pad]).reshape(nrows, 128)
    off2 = jnp.concatenate([offsets, pad]).reshape(nrows, 128)
    zpad = jnp.zeros((nrows * 128 - n,), i32)
    val2 = tuple(
        jnp.concatenate([v.astype(i32), zpad]).reshape(nrows, 128)
        for v in values
    )

    bounds = jax.lax.broadcasted_iota(i32, (nblk, 1), 0).squeeze(-1) * 128
    last = jnp.maximum(num_pairs - 1, 0)
    gid_lo = jnp.searchsorted(cum, jnp.minimum(bounds, last), side="right")
    gid_hi = jnp.searchsorted(
        cum, jnp.minimum(bounds + 127, last), side="right"
    )
    gid_lo = gid_lo.astype(i32)
    a = gid_lo >> 7  # aligned window start row
    overflow = jnp.any(gid_hi.astype(i32) > (a << 7) + (window - 1))

    def window_path():
        wiota = jax.lax.broadcasted_iota(i32, (1, window), 1)
        rowidx = a[:, None] + jax.lax.broadcasted_iota(
            i32, (1, wrows), 1
        )  # [nblk, wrows]
        cumw = cum2[rowidx].reshape(nblk, window)
        wabs = (a[:, None] << 7) + wiota  # [nblk, window] absolute index
        in_win = wabs >= gid_lo[:, None]
        slots = bounds[:, None] + jax.lax.broadcasted_iota(i32, (1, 128), 1)
        cnt_le = jnp.sum(
            ((cumw[:, None, :] <= slots[:, :, None]) & in_win[:, None, :]).astype(
                i32
            ),
            axis=2,
        )  # [nblk, 128]
        gid = jnp.minimum(gid_lo[:, None] + cnt_le, n - 1)
        onehot = wabs[:, None, :] == gid[:, :, None]

        def select(arr2):
            rows = arr2[rowidx].reshape(nblk, window)
            picked = jnp.sum(jnp.where(onehot, rows[:, None, :], 0), axis=2)
            return picked.reshape(-1)[:num_slots]

        return (
            gid.reshape(-1)[:num_slots],
            select(off2),
            *(select(v) for v in val2),
        )

    return jax.lax.cond(overflow, scatter_all, window_path)


def bin_gaussians(
    prep: Preprocessed,
    width: int,
    height: int,
    tile_size: int,
    max_pairs: int,
    align: int = 1,
    feat_rows: jnp.ndarray | None = None,
) -> TileBinning:
    """Build per-tile depth-ordered gaussian lists for the whole frame
    (static shapes). See :func:`bin_rects` for the machinery; tile shards
    bin their own strided tile subset via :func:`strided_tile_ranges` +
    :func:`bin_rects` instead (parallel/shard.py). With ``feat_rows``
    (``[N, 16]`` packed features) the per-pair feature blocks ride the pair
    sort and ``(TileBinning, pair_feat)`` is returned — see
    :func:`bin_rects`."""
    n_tiles_x = -(-width // tile_size)
    n_tiles_y = -(-height // tile_size)
    # Bin against the alpha-cull rect (subset of the reference bbox whose
    # excluded tiles provably contribute nothing; ops/projection.py).
    rects = tile_ranges(prep.cull_bbox, tile_size, n_tiles_x, n_tiles_y)
    return bin_rects(
        prep.depth, prep.active, rects, n_tiles_x, n_tiles_y, max_pairs, align,
        feat_rows=feat_rows,
    )


def bin_rects(
    depth: jnp.ndarray,
    active: jnp.ndarray,
    rects,
    n_tiles_x: int,
    n_tiles_y: int,
    max_pairs: int,
    align: int = 1,
    feat_rows: jnp.ndarray | None = None,
    tile_count_override: jnp.ndarray | None = None,
) -> TileBinning:
    """Bin gaussians with explicit per-gaussian tile rects onto an
    ``n_tiles_x x n_tiles_y`` tile grid (static shapes).

    ``rects = (tx0, ty0, ntx, nty)``, each ``[N]`` int32, in the coordinates
    of the *target grid* — whole-frame callers pass :func:`tile_ranges`
    output, tile shards pass :func:`strided_tile_ranges` output with their
    local grid dims.

    With ``align > 1`` every tile's pair segment starts at a multiple of
    ``align`` and is padded up to one with sentinel pairs. The Pallas kernels
    require this: their chunked DMA reads/writes then never cross a tile
    boundary (the backward writes whole per-chunk gradient slabs to HBM, and
    un-aligned tails would race with the next tile's rows). Sentinel pairs
    point at the zero feature row, whose empty bbox contributes exactly
    nothing — so the kernels need no per-lane masking at all.

    TPU cost model (profiled on v5e): XLA sorts are cheap but O(N log N)
    with a per-operand cost; per-element gathers/scatters at pair scale are
    the expensive primitives (~20 ns per gathered element). The
    implementation therefore:
      * never sorts the N gaussians at all — the exact overflow threshold
        comes from a 63-step binary search of masked O(N) reductions, and
        depth ordering rides the pair sort as a second key,
      * recovers each pair slot's owning gaussian with ONE row-gather of a
        packed ``[N, 8]`` int32 table (row gathers amortize the per-index
        cost over 32 bytes),
      * computes per-tile pair counts with an MXU histogram — the rect
        coverage indicator is separable, so ``counts = Y^T @ X`` of the
        per-axis one-hot range masks (0/1 values: exact in bf16 x f32-acc),
      * materializes alignment padding as explicit sentinel keys sorted in
        with the real pairs, so segments come out aligned by construction
        (no post-sort re-scatter, no searchsorted).

    Capacity overflow drops the *deepest whole gaussians* (every pair of a
    gaussian that does not fully fit is dropped); ``pair_demand > max_pairs``
    detects it.

    Returned ``pair_gaussian`` has length ``max_pairs + num_tiles*(align-1)``
    (real capacity plus the alignment-pad block).

    ``tile_count_override`` (``[num_tiles]`` i32, optional): externally
    computed per-tile covering counts — tile shards pass the strided
    extraction of the gaussian-axis-sharded global histogram
    (parallel/shard.py). Used only on the no-overflow fast path; under
    overflow the kept-gated local histogram is recomputed (the override
    counts gaussians the threshold search may have dropped).

    With ``feat_rows`` (the ``[N, 16]`` packed per-gaussian raster features,
    :func:`pack_feature_rows`) the 13 live feature columns RIDE the pair
    sort as extra value operands and the function returns ``(TileBinning,
    pair_feat)`` with ``pair_feat`` the dense column-major ``[nblk, 16,
    align]`` feature block array the Pallas kernels stream (bitwise equal to
    ``build_pair_feat(feat, pair_gaussian)``, raster_fwd.py). This fuses the
    P-scale post-sort feature gather into binning: the features are fetched
    once by the SAME ``[N, 24]`` row-gather that resolves each pair's
    binning row (row gathers amortize the ~20 ns per-index latency over
    bytes, so widening 8 -> 24 int32 columns is far cheaper than a second
    P-row gather), and tile-depth ordering comes for free from the sort.
    """
    n = depth.shape[0]
    num_tiles = n_tiles_x * n_tiles_y
    i32 = jnp.int32
    u32 = jnp.uint32

    tx0, ty0, ntx, nty = rects
    counts = jnp.where(active, ntx * nty, 0).astype(i32)
    iota_n = jax.lax.broadcasted_iota(i32, (n, 1), 0).squeeze(-1)
    total = jnp.sum(counts)  # pair demand before any clipping

    # 1. Exact overflow threshold, sortless. The kept set is the maximal
    #    (depth, id)-lexicographic prefix of gaussians whose cumulative pair
    #    count fits max_pairs — exactly what a stable depth sort + prefix
    #    cumsum selects, found here WITHOUT the O(N) sort:
    #      a) map f32 depth to its monotone uint32 encoding,
    #      b) binary-search (32 masked-reduction steps) the deepest fully-
    #         kept depth level,
    #      c) binary-search (31 steps) the last kept id inside the single
    #         partially-kept level at the boundary.
    #    (depth, id) ties resolve to id order, matching the reference's
    #    stable argsort (rasterize.py:424-425).
    bits = jax.lax.bitcast_convert_type(depth.astype(jnp.float32), u32)
    dkey = jnp.where(
        (bits & u32(0x80000000)) != 0, ~bits, bits | u32(0x80000000)
    )  # uint32, same order as the f32 depths
    cap = jnp.int32(max_pairs)

    def threshold_keep():
        """Kept pairs per gaussian under overflow (the 63-step search)."""

        def pairs_upto_depth(d):
            return jnp.sum(jnp.where(dkey <= d, counts, 0))

        def depth_bit(i, x):
            cand = x | jnp.left_shift(u32(1), (31 - i).astype(u32))
            return jnp.where(pairs_upto_depth(cand) <= cap, cand, x)

        dfull = jax.lax.fori_loop(0, 32, depth_bit, u32(0))
        full = (dkey <= dfull) & (pairs_upto_depth(dfull) <= cap)
        budget = cap - jnp.sum(jnp.where(full, counts, 0))

        boundary_candidates = jnp.logical_not(full) & (counts > 0)
        dmin = jnp.min(jnp.where(boundary_candidates, dkey, u32(0xFFFFFFFF)))
        at_boundary = boundary_candidates & (dkey == dmin)

        def pairs_upto_id(hi):
            return jnp.sum(jnp.where(at_boundary & (iota_n <= hi), counts, 0))

        def id_bit(i, x):
            cand = x | jnp.left_shift(i32(1), 30 - i)
            return jnp.where(pairs_upto_id(cand) <= budget, cand, x)

        ihi = jax.lax.fori_loop(0, 31, id_bit, i32(0))
        partial = at_boundary & (iota_n <= ihi) & (pairs_upto_id(ihi) <= budget)
        return jnp.where(full | partial, counts, 0)  # id order

    # No-overflow fast path: capacities are sized with headroom (1.5x
    # measured demand), so the search — 63 sequential O(N) masked
    # reductions — is runtime-skipped whenever the view fits. Under
    # overflow the search yields exactly what a stable depth sort + prefix
    # cumsum would keep, so both branches agree at total == cap.
    gaussian_counts = jax.lax.cond(total <= cap, lambda: counts, threshold_keep)
    cum = jnp.cumsum(gaussian_counts, dtype=i32)  # inclusive
    num_pairs = cum[-1]  # pairs actually emitted

    # 2. Lay segments out in gaussian-id order and recover, for every pair
    #    slot, its owning gaussian with the scatter-free windowed decode
    #    (:func:`expand_segments`), then ONE row-gather of the packed
    #    per-gaussian table. ``valid = slot < num_pairs`` is exact: segments
    #    tile [0, num_pairs) back-to-back and empties are never decoded.
    pair_gid, seg_off = expand_segments(gaussian_counts, max_pairs, cum=cum)

    base_cols = [tx0, ty0, ntx, jax.lax.bitcast_convert_type(dkey, i32)]
    if feat_rows is None:
        table = jnp.stack(base_cols, axis=1)  # [N, 4]
    else:
        # Widened table: the 13 live feature columns (bitcast) ride the same
        # row gather, so the pair sort can carry them (NUM_LIVE_FEATURES).
        fcols = jax.lax.bitcast_convert_type(
            feat_rows[:, :NUM_LIVE_FEATURES].astype(jnp.float32), i32
        )  # [N, 13]
        table = jnp.concatenate(
            [jnp.stack(base_cols, axis=1), fcols], axis=1
        )  # [N, 17]
    row = table[pair_gid]  # [max_pairs, 4 or 17]

    slot = jax.lax.broadcasted_iota(i32, (max_pairs, 1), 0).squeeze(-1)
    local = slot - seg_off
    valid = slot < num_pairs
    w = jnp.maximum(row[:, 2], 1)
    tile_x = row[:, 0] + local % w
    tile_y = row[:, 1] + local // w
    tile_id = jnp.where(valid, tile_y * n_tiles_x + tile_x, num_tiles)
    pair_val = jnp.where(valid, pair_gid, n)
    pair_dkey = jnp.where(
        valid, jax.lax.bitcast_convert_type(row[:, 3], u32), u32(0xFFFFFFFF)
    )
    if feat_rows is not None:
        # Invalid slots carry the zero feature row (empty bbox — exactly the
        # sentinel row the gather-based path reads, raster_fwd.py).
        pair_feats = jnp.where(
            valid[:, None],
            jax.lax.bitcast_convert_type(
                row[:, 4 : 4 + NUM_LIVE_FEATURES], jnp.float32
            ),
            0.0,
        )  # [max_pairs, 13]

    # 3. Per-tile pair counts via the MXU separable histogram
    #    (:func:`coverage_histogram`). Tile shards precompute these counts
    #    from the gaussian-axis-sharded GLOBAL histogram (one tiny psum,
    #    parallel/shard.py) and pass them as ``tile_count_override`` — valid
    #    whenever no gaussian was dropped, so under overflow (rare: budgets
    #    carry headroom) the kept-gated local histogram is recomputed.
    def local_hist():
        return (
            coverage_histogram(
                (tx0, ty0, ntx, nty), gaussian_counts > 0,
                n_tiles_x, n_tiles_y,
            )
            .reshape(num_tiles)
            .astype(i32)
        )

    if tile_count_override is None:
        tile_count = local_hist()
    else:
        tile_count = jax.lax.cond(
            total <= cap, lambda: tile_count_override, local_hist
        )

    # 4. Alignment pads as explicit sort keys: per tile, pad_t sentinel
    #    pairs with that tile's key and +inf depth, so the sort places them
    #    at each segment's tail.
    if align > 1:
        aligned_count = -(-tile_count // align) * align
        pad_t = aligned_count - tile_count  # in [0, align)
        padcap = num_tiles * (align - 1)
        pj = jax.lax.broadcasted_iota(i32, (num_tiles, align - 1), 1)
        ptile = jax.lax.broadcasted_iota(i32, (num_tiles, align - 1), 0)
        pad_keys = jnp.where(pj < pad_t[:, None], ptile, num_tiles).reshape(padcap)
        keys = jnp.concatenate([tile_id, pad_keys])
        dkeys = jnp.concatenate([pair_dkey, jnp.full((padcap,), u32(0xFFFFFFFF))])
        vals = jnp.concatenate([pair_val, jnp.full((padcap,), i32(n))])
    else:
        padcap = 0
        aligned_count = tile_count
        keys = tile_id
        dkeys = pair_dkey
        vals = pair_val

    # 5. ONE stable two-key (tile, depth) sort: per tile a contiguous
    #    depth-ordered (front-to-back) gaussian list, aligned by
    #    construction, so starts are just a cumsum. Stability resolves
    #    (tile, depth) ties to buffer order == gaussian id order, exactly
    #    the reference's stable depth sort semantics. With feat_rows the 13
    #    feature columns ride as value operands (alignment pads carry the
    #    zero feature row), so the sorted feature columns ARE the kernels'
    #    dense pair slab — no post-sort P-row gather.
    f_ops = ()
    if feat_rows is not None:
        zpad = jnp.zeros((padcap,), jnp.float32)
        f_ops = tuple(
            jnp.concatenate([pair_feats[:, j], zpad])
            for j in range(NUM_LIVE_FEATURES)
        )
    sorted_ops = jax.lax.sort(
        (keys, dkeys, vals) + f_ops, num_keys=2, is_stable=True
    )
    pair_gaussian = sorted_ops[2]
    tile_start = (jnp.cumsum(aligned_count) - aligned_count).astype(i32)

    tb = TileBinning(
        pair_gaussian=pair_gaussian.astype(i32),
        tile_start=tile_start,
        tile_count=tile_count,
        num_pairs=num_pairs,
        pair_demand=total.astype(i32),
        gaussian_counts=gaussian_counts,
    )
    if feat_rows is None:
        return tb

    # Pack the sorted feature columns into the kernels' dense column-major
    # [nblk, 16, align] block layout (trailing slots past the buffer end
    # hold the zero sentinel row, so kernels DMA whole blocks).
    p_buf = max_pairs + padcap
    nblk = -(-p_buf // align)
    tail = nblk * align - p_buf
    cols = [jnp.pad(c, (0, tail)).reshape(nblk, align) for c in sorted_ops[3:]]
    cols += [jnp.zeros((nblk, align), jnp.float32)] * (NUM_FEATURES - NUM_LIVE_FEATURES)
    pair_feat = jnp.stack(cols, axis=1)  # [nblk, 16, align]
    return tb, pair_feat


NUM_FEATURES = 16
NUM_LIVE_FEATURES = 13  # columns 0-12 carry data; 13-15 are lane padding
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
    feat = pack_feature_rows(prep)
    pad = jnp.zeros((1, feat.shape[-1]), dtype=feat.dtype)
    return jnp.concatenate([feat, pad], axis=0)


def pack_feature_rows(prep: Preprocessed) -> jnp.ndarray:
    """The ``[N, 16]`` feature rows of :func:`pack_features` without the
    sentinel pad row (tile shards all-gather rows first, then append one
    shared pad row)."""
    return jnp.concatenate(
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
