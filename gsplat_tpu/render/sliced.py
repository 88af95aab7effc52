"""Depth-sliced lazy binning + rasterization (the real-density fast path).

The standard pipeline (ops/binning.py) sorts EVERY (tile, gaussian) pair of
the view before the compositor runs — at real MipNeRF-360 density (~40M
pairs, 1080p) the round-4 stage breakdown (PROFILE_r04_real.txt) measured
that sort+slab at 76% of the frame while early termination composites only
~6% of the pair blocks. This module makes the P-scale work lazy so it
scales with *composited* pairs instead:

  1. Gaussians are depth-sorted ONCE at N scale (5M rows, ~8x smaller than
     the pair scale, and O(N log N) with one i32 payload). Ties resolve to
     gaussian-id order — lexicographic (depth, id), exactly the reference's
     stable argsort semantics (rasterize.py:424-425).
  2. Pairs are then emitted in global front-to-back depth order, so a
     contiguous range of sorted gaussians is a *depth slice*: per-slice
     binning needs only ONE stable 1-key sort by tile id (depth ordering
     rides the emission order through the stable sort), carrying the 13
     feature columns exactly like the fused path.
  3. A ``lax.while_loop`` processes slices of ``cfg.slice_pairs`` pairs
     front-to-back, carrying the per-tile compositing state ([T, 8, npix]
     accumulators) through the carry-in Pallas kernels
     (kernels/raster_fwd.forward_tiles_carry / raster_bwd
     backward_tiles_carry) and a per-tile ``done`` flag (transmittance
     below ``cfg.early_stop_transmittance`` — the same check the in-kernel
     early stop uses). The loop exits as soon as EVERY tile is done: the
     deep pairs the compositor would never read are never binned, never
     sorted, never gathered.
  4. Whole gaussians whose rect covers only done tiles are culled per slice
     with a separable bilinear query (y_mask @ notdone2d · x_mask — two
     tiny MXU ops, no gathers), so late slices fill with pairs that can
     still matter.
  5. The per-slice prologue itself (the cull query, the count cumsum, the
     segment decode) runs on a dynamic ``slice_pairs``-id WINDOW of the
     sorted axis — one slice consumes a contiguous run, and at production
     densities a window that long supplies a full slice — with an exact
     full-N branch under ``lax.cond`` whenever it cannot (late
     heavily-culled slices, the final partial slice).

N-scale cost discipline (round-4/5 probes on the v5e at 5M rows: a [N]
i32 narrow gather by the depth permutation costs ~60 ms, a [N, 16] row
gather ~93 ms, one extra depth-sort value operand ~10 ms, an N-element
scatter ~4.7 ns/update regardless of target size): NOTHING is permuted or
scattered at N scale outside the one 4-operand depth sort — the packed
rect words ride the sort as values, per-pair lookups come from the
windowed decode's one-hot selects (ops/binning.expand_segments), and the
feature slab is fetched at P scale from the id-ordered ``feat`` rows.
Because pair slots carry original ids, the gradient reduction lands
directly in original-id order — no inverse permutation is ever
materialized.

Semantics: identical to the standard Pallas path at the same
``early_stop_transmittance`` (done is checked at slice granularity with
the same threshold the kernel checks at block granularity; alignment-pad
sentinels are exactly neutral: x*1.0 and x+0.0). With early stop disabled
the loop runs every slice and the result matches the unsliced compositor
to 1-2 ULP (slice boundaries re-chunk the per-tile scans, reassociating
the transmittance products; the pair ORDER is identical). Overflow policy matches ops/binning.py: at most
``ceil(cfg.max_pairs / cfg.slice_pairs)`` slices run, so the deepest whole
gaussians are dropped when demand exceeds the budget.

The backward replays executed slices front-to-back (recompute design of
kernels/raster_bwd.py), threading the walk-state carry. Slice 0's dense
feature slab is a forward residual (the loop runs ONE slice at production
density, so the replay usually needs no P-scale regather at all); later
slices regather from the stored original-id pairs (64 B/pair,
block-granular, the same ``build_pair_feat`` gather both kernels share).
Pair gradients reduce with a sort-by-id + cumsum segment reduction (the
nine gradient columns ride the sort as value operands — see
kernels/raster_bwd.sorted_grad_cumsum) whose boundaries come from a
per-id last-position scatter-max (slices partition the gaussians, so per-slice contributions
are disjoint and sum exactly).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from gsplat_tpu.config import RasterConfig
from gsplat_tpu.ops import binning as B
from gsplat_tpu.ops.projection import Preprocessed

_I32 = jnp.int32
_U32 = jnp.uint32
_F32 = jnp.float32


def _monotone_depth_key(depth: jnp.ndarray) -> jnp.ndarray:
    """f32 depth -> uint32 with the same total order (ops/binning.py)."""
    bits = jax.lax.bitcast_convert_type(depth.astype(_F32), _U32)
    return jnp.where(
        (bits & _U32(0x80000000)) != 0, ~bits, bits | _U32(0x80000000)
    )


def _grid(width: int, height: int, ts: int) -> Tuple[int, int, int]:
    ntxg = -(-width // ts)
    ntyg = -(-height // ts)
    return ntxg, ntyg, ntxg * ntyg


def _rect_bits(ntxg: int, ntyg: int) -> Tuple[int, int]:
    """Bit widths for the packed per-gaussian rect words."""
    bx = max(int(ntxg).bit_length(), 1)
    by = max(int(ntyg).bit_length(), 1)
    assert bx + by + 1 <= 31, (ntxg, ntyg)
    return bx, by


def _sizes(cfg: RasterConfig, num_tiles: int):
    """Static buffer sizes of one slice."""
    align = cfg.pair_block
    s_cap = cfg.slice_pairs
    assert s_cap % align == 0, "slice_pairs must be a pair_block multiple"
    assert s_cap >= num_tiles, (
        "slice_pairs must cover one gaussian's worst-case tile count "
        f"({num_tiles}) to guarantee forward progress"
    )
    k_max = max(-(-cfg.max_pairs // s_cap), 1)
    padcap = num_tiles * (align - 1)
    p_buf = s_cap + padcap
    nblk_s = -(-p_buf // align)
    s_store = nblk_s * align
    return align, s_cap, k_max, padcap, p_buf, nblk_s, s_store


def _alive_mask(done, g0, iota_n, tx0, ty0, ntx, nty, ntxg, ntyg, es):
    """Un-consumed gaussians whose rect still touches a not-done tile.

    The not-done count over a rect is a separable bilinear form
    ``y_g^T @ notdone2d @ x_g`` — one [N, ntyg] x [ntyg, ntxg] matmul and an
    elementwise masked row-sum, no gathers. 0/1 inputs with f32 accumulation
    are exact (values <= num_tiles), so the q > 0.5 test is crisp.

    When no tile is done yet (every slice-0 entry) the rect query is the
    constant True — a ``lax.cond`` skips the [N, tiles] mask build entirely.
    """
    if es <= 0.0:
        return iota_n >= g0

    def rect_query(_):
        ndm = jnp.logical_not(done).reshape(ntyg, ntxg).astype(jnp.bfloat16)
        tyc = jax.lax.broadcasted_iota(_I32, (1, ntyg), 1)
        txc = jax.lax.broadcasted_iota(_I32, (1, ntxg), 1)
        ym = ((tyc >= ty0[:, None]) & (tyc < (ty0 + nty)[:, None])).astype(
            jnp.bfloat16
        )
        xm = ((txc >= tx0[:, None]) & (txc < (tx0 + ntx)[:, None])).astype(_F32)
        rowhit = jax.lax.dot_general(
            ym, ndm,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=_F32,
        )  # [N, ntxg]
        return jnp.sum(rowhit * xm, axis=1) > 0.5

    hit = jax.lax.cond(
        jnp.any(done), rect_query, lambda _: jnp.ones(iota_n.shape, bool), None
    )
    return hit & (iota_n >= g0)


def _slice_counts(alive, g1, cnt, iota_n):
    """Per-gaussian kept pairs of the slice [g0 is baked into alive]."""
    in_slice = alive & (iota_n < g1)
    return jnp.where(in_slice, cnt, 0), in_slice


def _bin_slice(feat, order, w0s, w1s, cnt_k, cum, pairs_k,
               bxw, byw, ntxg, ntyg, cfg, decode_window=2048):
    """Build one slice's sorted pair buffer + dense feature slab.

    ``feat``: the [N+1, 16] f32 feature rows in ORIGINAL id order (row N
    the zero sentinel); ``order``/``w0s``/``w1s``: the depth-sorted
    original-id permutation and rect words (values of the 4-operand depth
    sort — nothing is ever permuted at N scale outside that sort). These
    four arrays may be a contiguous WINDOW of the sorted axis rather than
    the full length (the loop's window fast path): everything here is
    position-relative except the original ids, which ``order`` carries.

    Returns (pair_feat [nblk_s, 16, align], pair_ids [s_store] i32 —
    ORIGINAL gaussian id per slot, sentinel N — tile_start [T],
    tile_count [T] true counts)."""
    n = feat.shape[0] - 1  # sentinel id = the zero feature row
    num_tiles = ntxg * ntyg
    align, s_cap, _, padcap, p_buf, nblk_s, s_store = _sizes(cfg, num_tiles)
    mskx = (1 << bxw) - 1
    msky = (1 << byw) - 1

    # Segment layout: slices are contiguous in the depth-sorted emission
    # order, so segments tile [0, pairs_k) back-to-back — every slot below
    # pairs_k is valid by construction (no per-slot count check needed).
    # ``cum`` is the loop's alive-gated cumsum (un-gated by g1); clamping at
    # pairs_k makes it EXACTLY the inclusive cumsum of the slice's own
    # counts (for i >= g1 the slice count is 0 and cum >= pairs_k), so the
    # scatter-free windowed decode (ops/binning.expand_segments) replaces
    # the two N-scale marker scatters this loop used to pay per slice. The
    # searchsorted inside lands at g0's neighborhood on its own — the
    # decode is inherently windowed to the slice — and the owning
    # gaussian's original id + rect words ride the same windowed one-hot,
    # so no per-slice narrow gathers exist either.
    cum_slice = jnp.minimum(cum, pairs_k)
    _, seg_off, orig_p, w0p, w1p = B.expand_segments(
        cnt_k, s_cap, cum=cum_slice, window=decode_window,
        values=(order, w0s, w1s),
    )
    slot = jax.lax.broadcasted_iota(_I32, (s_cap, 1), 0).squeeze(-1)
    local = slot - seg_off

    w = jnp.maximum(w1p & mskx, 1)
    tx_p = (w0p & mskx) + local % w
    ty_p = ((w0p >> bxw) & msky) + local // w
    valid = slot < pairs_k
    key = jnp.where(valid, ty_p * ntxg + tx_p, num_tiles)
    vals = jnp.where(valid, orig_p, n)  # ORIGINAL gaussian id per pair
    # Invalid slots carry the sentinel row N — all-zero features.
    feats13 = feat[vals][:, :13]

    # Per-tile counts: the separable MXU histogram over this slice's PAIRS
    # (each valid pair contributes exactly one (tx, ty) tile — identical to
    # the per-gaussian rect histogram, but P-scale instead of N-scale).
    txc = jax.lax.broadcasted_iota(_I32, (1, ntxg), 1)
    tyc = jax.lax.broadcasted_iota(_I32, (1, ntyg), 1)
    xm = ((txc == tx_p[:, None]) & valid[:, None]).astype(jnp.bfloat16)
    ym = (tyc == ty_p[:, None]).astype(jnp.bfloat16)
    counts2d = jax.lax.dot_general(
        ym, xm,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=_F32,
    )
    tile_count = counts2d.reshape(num_tiles).astype(_I32)

    # Alignment pads as explicit sort keys (stable sort keeps them after
    # each tile's real pairs; they carry the zero feature row).
    aligned = -(-tile_count // align) * align
    pad_t = aligned - tile_count
    pj = jax.lax.broadcasted_iota(_I32, (num_tiles, align - 1), 1)
    ptile = jax.lax.broadcasted_iota(_I32, (num_tiles, align - 1), 0)
    pad_keys = jnp.where(pj < pad_t[:, None], ptile, num_tiles).reshape(padcap)
    keys_all = jnp.concatenate([key, pad_keys])
    vals_all = jnp.concatenate([vals, jnp.full((padcap,), n, _I32)])
    zpad = jnp.zeros((padcap,), _F32)
    f_ops = tuple(
        jnp.concatenate([feats13[:, j], zpad]) for j in range(13)
    )
    # ONE stable 1-key sort: emission order is already depth order, so a
    # stable grouping by tile is a full (tile, depth, id) ordering.
    sorted_ops = jax.lax.sort(
        (keys_all, vals_all) + f_ops, num_keys=1, is_stable=True
    )
    pair_ids = jnp.pad(sorted_ops[1], (0, s_store - p_buf), constant_values=n)
    tile_start = (jnp.cumsum(aligned) - aligned).astype(_I32)

    tail = s_store - p_buf
    cols = [jnp.pad(c, (0, tail)).reshape(nblk_s, align) for c in sorted_ops[2:]]
    cols += [jnp.zeros((nblk_s, align), _F32)] * (16 - 13)
    pair_feat = jnp.stack(cols, axis=1)  # [nblk_s, 16, align]
    return pair_feat, pair_ids, tile_start, tile_count


def _forward_impl(feat, order, w0s, w1s, width, height, cfg):
    """Run the slice loop. Returns (color, trans, residual dict).

    ``feat``: [N+1, 16] f32 rows in ORIGINAL id order (ops/binning
    ``pack_features``; cols 13-15 zero, row N the sentinel). ``order`` /
    ``w0s`` / ``w1s``: the depth permutation and packed rect words, all
    [N] i32 in DEPTH order — carried as value operands of the one 4-operand
    depth sort (:func:`_prepare_sliced`). Nothing else is permuted at N
    scale: a [N, 16] row gather by the permutation costs ~93 ms at 5M rows
    on the v5e (~19 ns/row, latency-bound), while riding the sort costs
    ~10 ms/operand — and per-pair lookups come from the windowed decode's
    one-hot selects (ops/binning.expand_segments), not gathers.
    """
    from gsplat_tpu.kernels.raster_fwd import forward_tiles_carry

    ts = cfg.tile_size
    ntxg, ntyg, num_tiles = _grid(width, height, ts)
    align, s_cap, k_max, padcap, p_buf, nblk_s, s_store = _sizes(cfg, num_tiles)
    bxw, byw = _rect_bits(ntxg, ntyg)
    n = order.shape[0]
    npix = ts * ts
    es = cfg.early_stop_transmittance
    iota_n = jax.lax.broadcasted_iota(_I32, (n, 1), 0).squeeze(-1)
    tile_ids = jnp.arange(num_tiles, dtype=_I32)
    mskx = (1 << bxw) - 1
    msky = (1 << byw) - 1

    # Unpack the [N]-scale depth-sorted rect/count columns (elementwise).
    tx0 = w0s & mskx
    ty0 = (w0s >> bxw) & msky
    ntx = w1s & mskx
    nty = (w1s >> bxw) & msky
    active = (w1s >> (bxw + byw)) & 1
    cnt = jnp.where(active == 1, ntx * nty, 0)

    accum0 = jnp.zeros((num_tiles, 8, npix), _F32).at[:, 3, :].set(1.0)
    # Saturation is judged on COVERABLE pixels only: the reference's
    # covering bbox clamps to width-1/height-1 exclusive (ops/projection
    # covering_bbox), so the last pixel row/column — and any out-of-frame
    # pixels of edge tiles — can never receive a contribution and their
    # transmittance stays 1.0 forever. Without the mask the edge tiles
    # would never read as done and the slice loop would always run to pair
    # exhaustion (the fwd kernel masks its in-kernel check identically).
    t_lin = jax.lax.broadcasted_iota(_I32, (num_tiles, npix), 1)
    t_idx = jax.lax.broadcasted_iota(_I32, (num_tiles, npix), 0)
    pxg = (t_idx % ntxg) * ts + t_lin % ts
    pyg = (t_idx // ntxg) * ts + t_lin // ts
    inframe = ((pxg < width - 1) & (pyg < height - 1)).astype(_F32)
    state0 = dict(
        k=jnp.int32(0),
        g0=jnp.int32(0),
        accum=accum0,
        done=jnp.zeros((num_tiles,), bool),
        ids=jnp.full((k_max, s_store), n, _I32),
        starts=jnp.zeros((k_max, num_tiles), _I32),
        countc=jnp.zeros((k_max, num_tiles), _I32),
        bdone=jnp.zeros((k_max, num_tiles), _I32),
        dsnap=jnp.zeros((k_max, num_tiles), bool),
        gb=jnp.zeros((k_max + 1,), _I32),
        # Slice 0's dense feature slab, kept as a residual: the loop runs
        # ONE slice at production density, so the backward usually replays
        # without any P-scale regather.
        slab0=jnp.zeros((nblk_s, 16, align), _F32),
    )

    def cond(c):
        go = (c["k"] < k_max) & (c["g0"] < n)
        if es > 0.0:
            go = go & jnp.logical_not(jnp.all(c["done"]))
        return go

    # Window fast path: one slice consumes a CONTIGUOUS run of the
    # depth-sorted axis, and at production densities (>= ~1 pair per alive
    # gaussian) a run of ``w_ids`` ids supplies >= s_cap pairs — so the
    # whole per-slice N-scale prologue (the done-cull rect query, the
    # count cumsum, the decode) runs on a dynamic window of w_ids rows
    # instead of all N. When the window cannot supply a full slice (late,
    # heavily-culled slices or the final partial one) an exact full-N
    # branch runs instead — the emitted pairs are identical either way.
    w_ids = min(s_cap, n)
    win_enabled = w_ids < n

    def slice_at(x, start, length):
        return jax.lax.dynamic_slice_in_dim(x, start, length, axis=0)

    def make_slice(k, g0, done, start, length, iota, o_, a_, b_, tx_, ty_,
                   nx_, ny_, cnt_, dwin):
        alive = _alive_mask(done, g0, iota, tx_, ty_, nx_, ny_, ntxg,
                            ntyg, es)
        cnt_k0 = jnp.where(alive, cnt_, 0)
        cum = jnp.cumsum(cnt_k0)
        # Largest prefix fitting the slice: first index with cum > s_cap.
        g1r = jnp.searchsorted(cum, _I32(s_cap), side="right").astype(_I32)
        pairs_k = jnp.where(g1r > 0, cum[jnp.maximum(g1r - 1, 0)], 0)
        cnt_k, _ = _slice_counts(alive, start + g1r, cnt_, iota)
        outs = _bin_slice(
            feat, o_, a_, b_, cnt_k, cum, pairs_k,
            bxw, byw, ntxg, ntyg, cfg, decode_window=dwin,
        )
        return outs + (start + g1r, cum[-1])

    def body(c):
        k, g0, done = c["k"], c["g0"], c["done"]

        def full_branch():
            return make_slice(
                k, g0, done, _I32(0), n, iota_n, order, w0s, w1s,
                tx0, ty0, ntx, nty, cnt, 2048,
            )[:-1]

        if win_enabled:
            g0c = jnp.clip(g0, 0, n - w_ids)
            win = tuple(
                slice_at(x, g0c, w_ids)
                for x in (order, w0s, w1s, tx0, ty0, ntx, nty, cnt)
            )
            iota_w = g0c + jax.lax.broadcasted_iota(
                _I32, (w_ids, 1), 0
            ).squeeze(-1)

            def window_branch():
                outs = make_slice(
                    k, g0, done, g0c, w_ids, iota_w, *win, 512,
                )
                return outs[:-1]

            # Enough pairs inside the window, or the window already
            # reaches the end of the sorted axis?
            def probe():
                alive = _alive_mask(done, g0, iota_w, win[3], win[4],
                                    win[5], win[6], ntxg, ntyg, es)
                return jnp.sum(jnp.where(alive, win[7], 0))

            enough = (g0c + w_ids >= n) | (probe() >= s_cap)
            pair_feat, pair_ids, tile_start, tile_count, g1 = jax.lax.cond(
                enough, window_branch, full_branch
            )
        else:
            pair_feat, pair_ids, tile_start, tile_count, g1 = full_branch()
        countc = jnp.where(done, 0, tile_count)
        accum = forward_tiles_carry(
            pair_feat, tile_start, countc, tile_ids, c["accum"], ntxg, cfg,
            interpret=cfg.force_pallas_interpret, width=width, height=height,
        )
        bdone = accum[:, 4, 0].astype(_I32)
        new_done = done
        if es > 0.0:
            new_done = done | (
                jnp.max(accum[:, 3, :] * inframe, axis=1) < es
            )

        upd = lambda store, row: jax.lax.dynamic_update_slice(
            store, row[None], (k,) + (0,) * row.ndim
        )
        return dict(
            k=k + 1,
            g0=g1,
            accum=accum,
            done=new_done,
            ids=upd(c["ids"], pair_ids),
            starts=upd(c["starts"], tile_start),
            countc=upd(c["countc"], countc),
            bdone=upd(c["bdone"], bdone),
            dsnap=upd(c["dsnap"], done),
            gb=jax.lax.dynamic_update_slice(c["gb"], g1[None], (k + 1,)),
            slab0=jnp.where(k == 0, pair_feat, c["slab0"]),
        )

    out = jax.lax.while_loop(cond, body, state0)
    color = jnp.moveaxis(out["accum"][:, 0:3, :], 1, 2)  # [T, npix, 3]
    trans = out["accum"][:, 3, :]
    return color.astype(feat.dtype), trans.astype(feat.dtype), out


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _rasterize_sliced(feat, order, w0s, w1s, width, height, cfg):
    color, trans, _ = _forward_impl(feat, order, w0s, w1s, width, height, cfg)
    return color, trans


def _fwd(feat, order, w0s, w1s, width, height, cfg):
    color, trans, out = _forward_impl(feat, order, w0s, w1s, width, height, cfg)
    residuals = (
        feat, order, color, trans,
        out["k"], out["ids"], out["starts"], out["countc"], out["bdone"],
        out["slab0"],
    )
    return (color, trans), residuals


def _bwd(width, height, cfg, residuals, cotangents):
    import numpy as np

    from gsplat_tpu.kernels.raster_bwd import (
        backward_tiles_carry, pack_tile_rows, reduction_basis,
        sorted_grad_cumsum,
    )
    from gsplat_tpu.kernels.raster_fwd import build_pair_feat

    (feat, order, color, trans, k_exec, ids, starts, countc, bdone,
     slab0) = residuals
    g_color, g_trans = cotangents
    ts = cfg.tile_size
    ntxg, ntyg, num_tiles = _grid(width, height, ts)
    align, s_cap, k_max, padcap, p_buf, nblk_s, s_store = _sizes(cfg, num_tiles)
    n = order.shape[0]
    tile_ids = jnp.arange(num_tiles, dtype=_I32)

    g_out = pack_tile_rows(g_color, g_trans)
    basis = reduction_basis(g_color, ts)
    fwd_out = pack_tile_rows(color, trans)
    # Walk-state init, exactly the non-carry kernel's (raster_bwd.py):
    # row 0 the cotangent-contracted suffix signal, row 1 transmittance 1.
    row0 = jnp.sum(g_out[:, 0:4, :] * fwd_out[:, 0:4, :], axis=1)  # [T, npix]
    carry = jnp.stack([row0, jnp.ones_like(row0)], axis=1)  # [T, 2, npix]

    # Pair ids are ORIGINAL gaussian ids, so the regather reads ``feat``
    # itself (cols 13-15 are zero in pack_features — bitwise identical to
    # the forward slab's zero-padded rows) and the reduction lands directly
    # in original-id order: no inverse permutation exists anywhere.
    feat32 = feat.astype(_F32)

    def run_bwd_kernel(k, carry):
        ids_k = ids[k]
        # Slice 0's dense slab was saved by the forward (the loop runs ONE
        # slice at production density, so this usually removes the whole
        # P-scale regather); later slices regather from the stored
        # original-id pairs. build_pair_feat's chunked path rounds its
        # block count up to a gather-segment multiple; trim to the slice's
        # own block count so the gradient slab lines up with the written
        # mask.
        pair_feat = jax.lax.cond(
            k == 0,
            lambda: slab0,
            lambda: build_pair_feat(feat32, ids_k, align)[:nblk_s],
        )
        pair_grads, carry = backward_tiles_carry(
            pair_feat, starts[k], countc[k], tile_ids, bdone[k],
            g_out, basis, carry, ntxg, cfg,
            interpret=cfg.force_pallas_interpret,
        )
        return ids_k, pair_grads, carry

    def reduce_sorted(ids_sorted, cum9, length):
        """Per-id segment sums from an id-sorted cumsum: gather at each
        id's LAST position (a scatter-max over the sorted ids) minus the
        previous id's last position (a cummax over ids)."""
        lastpos = jnp.full((n + 1,), -1, _I32).at[ids_sorted].max(
            jnp.arange(length, dtype=_I32), mode="drop"
        )
        prev_end = jnp.concatenate(
            [jnp.full((1,), -1, _I32), jax.lax.cummax(lastpos)[:-1]]
        )
        have = (lastpos >= 0)[:n]
        g_at = cum9[jnp.maximum(lastpos, 0)[:n]]
        g_prev = jnp.where(
            (prev_end >= 0)[:n, None], cum9[jnp.maximum(prev_end, 0)[:n]], 0.0
        )
        return jnp.where(have[:, None], g_at - g_prev, 0.0)  # [n, 9]

    def slice_bwd(k, st):
        """Per-slice reduction: sort this slice's pair grads by original id
        and difference a cumsum at each id's last position. Exact for any
        composited-pair volume; slices partition the gaussians, so the
        per-slice contributions are disjoint and sum exactly."""
        carry, d_acc = st
        ids_k, pair_grads, carry = run_bwd_kernel(k, carry)
        # Rows the kernel wrote: each not-done tile's first bdone blocks
        # (raster_bwd.py written_mask).
        delta = jnp.zeros((s_store + 1,), _I32)
        delta = delta.at[starts[k]].add(1, mode="drop")
        delta = delta.at[starts[k] + bdone[k] * align].add(-1, mode="drop")
        written = jnp.cumsum(delta[:-1]) > 0
        cols = [
            jnp.where(written, pair_grads[:, j, :].reshape(-1), 0.0)
            for j in range(9)
        ]
        sorted_ids, cum9 = sorted_grad_cumsum(ids_k, cols)
        return carry, d_acc + reduce_sorted(sorted_ids, cum9, s_store)

    d0 = jnp.zeros((n, 9), _F32)
    r_blk = cfg.reduce_pairs // align
    if r_blk <= 0:
        _, d_acc = jax.lax.fori_loop(0, k_exec, slice_bwd, (carry, d0))
    else:
        # Cross-slice COMPACT reduction: with early termination the kernel
        # writes only each tile's first bdone blocks (at real density ~1%
        # of the pair budget). Append just those blocks — with their pair
        # ids — to one [r_blk * align]-pair buffer as the slices replay,
        # then run ONE sort+cumsum reduction at that scale: the per-slice
        # sorts collapse into a single small pass. Exact: if the composited
        # blocks overflow r_blk, a lax.cond replays the loop with the
        # per-slice exact reduction.
        r_cap = r_blk * align
        t_iota = jnp.arange(num_tiles, dtype=_I32)
        slot_b = jnp.arange(r_blk, dtype=_I32)

        def slice_compact(k, st):
            carry, cg, cid, used, overflow = st
            ids_k, pair_grads, carry = run_bwd_kernel(k, carry)
            done_k = bdone[k]
            off_t = used + jnp.cumsum(done_k) - done_k  # [T]
            tot_k = jnp.sum(done_k)
            mark = jnp.zeros((r_blk,), _I32).at[
                jnp.where(done_k > 0, off_t, r_blk)
            ].max(t_iota, mode="drop")
            tile_of = jax.lax.cummax(mark)
            src_blk = starts[k][tile_of] // align + (slot_b - off_t[tile_of])
            in_range = (slot_b >= used) & (slot_b < used + tot_k)
            src_blk = jnp.where(in_range, jnp.clip(src_blk, 0, nblk_s - 1), 0)
            cg = jnp.where(
                in_range[:, None, None], pair_grads[src_blk], cg
            )
            cid = jnp.where(
                in_range[:, None], ids_k.reshape(nblk_s, align)[src_blk], cid
            )
            overflow = overflow | (used + tot_k > r_blk)
            used = jnp.minimum(used + tot_k, jnp.int32(r_blk))
            return carry, cg, cid, used, overflow

        cg0 = jnp.zeros((r_blk, 16, align), _F32)
        cid0 = jnp.full((r_blk, align), n, _I32)
        _, cg, cid, used, overflow = jax.lax.fori_loop(
            0, k_exec, slice_compact,
            (carry, cg0, cid0, jnp.int32(0), jnp.zeros((), bool)),
        )

        def compact_reduce():
            ids_c = jnp.where(
                (slot_b < used)[:, None], cid, n
            ).reshape(-1)
            cols = [cg[:, j, :].reshape(-1) for j in range(9)]
            sorted_ids, cum9 = sorted_grad_cumsum(ids_c, cols)
            return reduce_sorted(sorted_ids, cum9, r_cap)

        def exact_replay():
            _, d = jax.lax.fori_loop(0, k_exec, slice_bwd, (carry, d0))
            return d

        d_acc = jax.lax.cond(overflow, exact_replay, compact_reduce)
    d9 = jnp.concatenate([d_acc, jnp.zeros((1, 9), _F32)])
    d_feat = jnp.pad(d9, ((0, 0), (0, feat.shape[1] - 9))).astype(feat.dtype)

    zero_i = np.zeros((n,), dtype=jax.dtypes.float0)
    return d_feat, zero_i, zero_i, zero_i


_rasterize_sliced.defvjp(_fwd, _bwd)


def _prepare_sliced(prep: Preprocessed, ts: int, ntxg: int, ntyg: int):
    """The depth permutation + depth-ordered rect words the loop consumes.

    ONE stable 4-operand sort carries everything the loop needs at N scale
    (original id, packed rect words) into depth order — a [N, 16] row
    gather by the permutation costs ~9x more than the two extra sort
    operands at 5M rows. Returns (order, w0s, w1s), all [N] i32.
    """
    bxw, byw = _rect_bits(ntxg, ntyg)
    n = prep.depth.shape[0]
    iota_n = jnp.arange(n, dtype=_I32)
    tx0, ty0, ntx, nty = B.tile_ranges(prep.cull_bbox, ts, ntxg, ntyg)
    w0 = tx0 | (ty0 << bxw)
    w1 = ntx | (nty << bxw) | (prep.active.astype(_I32) << (bxw + byw))
    dkey = _monotone_depth_key(prep.depth)
    # Stable 1-key sort: ties keep id order -> (depth, id) lexicographic,
    # the reference's stable argsort semantics.
    return jax.lax.sort(
        (dkey, iota_n, w0, w1), num_keys=1, is_stable=True
    )[1:4]


def render_sliced_tiles(
    prep: Preprocessed,
    feat: jnp.ndarray,
    width: int,
    height: int,
    cfg: RasterConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Depth-sliced render of one view at tile level.

    Args: prep — the per-gaussian preprocess; feat — [N+1, 16] packed
    features in original id order (ops/binning ``pack_features``; the
    differentiable surface). Returns (color [T, npix, 3], trans [T, npix])
    for the full tile grid. Requires the Pallas path (TPU or interpreter
    mode).
    """
    ts = cfg.tile_size
    ntxg, ntyg, _ = _grid(width, height, ts)
    order, w0s, w1s = _prepare_sliced(prep, ts, ntxg, ntyg)
    return _rasterize_sliced(
        feat, order, jax.lax.stop_gradient(w0s), jax.lax.stop_gradient(w1s),
        width, height, cfg,
    )
