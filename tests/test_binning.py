"""Tile binning unit tests — including the zero-count interleaving case
(culled/offscreen gaussians between visible ones in depth order)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gsplat_tpu.ops import binning
from gsplat_tpu.ops.projection import Preprocessed


def make_prep(means_xy, radii, depths, active=None, width=64, height=64):
    """Hand-built Preprocessed with square bboxes around given centers."""
    n = len(means_xy)
    means = np.asarray(means_xy, np.float32)
    r = np.asarray(radii, np.float32)
    bbox = np.stack(
        [
            np.clip(means[:, 0] - r, 0, width - 1),
            np.clip(means[:, 1] - r, 0, height - 1),
            np.clip(means[:, 0] + r, 0, width - 1),
            np.clip(means[:, 1] + r, 0, height - 1),
        ],
        axis=-1,
    ).astype(np.int32)
    if active is None:
        active = np.ones(n, bool)
    return Preprocessed(
        screen_means=jnp.asarray(means),
        conics=jnp.ones((n, 3), jnp.float32),
        rgb=jnp.ones((n, 3), jnp.float32),
        opacity=jnp.ones((n,), jnp.float32),
        depth=jnp.asarray(depths, jnp.float32),
        bbox=jnp.asarray(bbox),
        cull_bbox=jnp.asarray(bbox),  # no alpha culling in hand-built cases
        active=jnp.asarray(active),
    )


def expected_pairs(prep, width, height, tile_size):
    """Brute-force (tile -> depth-ordered gaussian list) reference."""
    ntx = -(-width // tile_size)
    nty = -(-height // tile_size)
    out = {t: [] for t in range(ntx * nty)}
    order = np.argsort(np.asarray(prep.depth), kind="stable")
    for g in order:
        if not bool(prep.active[g]):
            continue
        x0, y0, x1, y1 = (int(v) for v in prep.bbox[g])
        if x1 <= x0 or y1 <= y0:
            continue
        for ty in range(max(y0 // tile_size, 0), min((y1 - 1) // tile_size, nty - 1) + 1):
            for tx in range(max(x0 // tile_size, 0), min((x1 - 1) // tile_size, ntx - 1) + 1):
                out[ty * ntx + tx].append(int(g))
    return out


def check_binning(prep, width=64, height=64, tile_size=16, max_pairs=1 << 10, align=1):
    bins = binning.bin_gaussians(prep, width, height, tile_size, max_pairs, align=align)
    want = expected_pairs(prep, width, height, tile_size)
    pg = np.asarray(bins.pair_gaussian)
    starts = np.asarray(bins.tile_start)
    counts = np.asarray(bins.tile_count)
    for t, expected in want.items():
        got = pg[starts[t] : starts[t] + counts[t]].tolist()
        assert got == expected, f"tile {t}: got {got}, want {expected}"


def test_simple_two_tiles():
    prep = make_prep([[8, 8], [40, 40]], [4, 4], [1.0, 2.0])
    check_binning(prep)


def test_multi_tile_coverage_and_depth_order():
    prep = make_prep(
        [[16, 16], [16, 16], [30, 30]], [10, 2, 20], [2.0, 1.0, 3.0]
    )
    check_binning(prep)


def test_zero_count_gaussians_interleaved():
    """Inactive gaussians between visible ones must not shift rank mapping
    (regression: cumsum-of-markers mis-ranked everything after a zero-count
    gaussian)."""
    rng = np.random.default_rng(0)
    n = 60
    means = rng.uniform(0, 64, (n, 2))
    radii = rng.uniform(2, 12, n)
    depths = rng.uniform(1, 10, n)
    active = rng.uniform(size=n) < 0.5  # half culled, randomly interleaved
    prep = make_prep(means, radii, depths, active)
    check_binning(prep)
    check_binning(prep, align=8)


def test_first_gaussian_inactive():
    prep = make_prep(
        [[8, 8], [8, 8]], [4, 4], [1.0, 2.0], active=[False, True]
    )
    check_binning(prep)


def test_alignment_pads_segments():
    prep = make_prep([[8, 8], [40, 40], [40, 8]], [4, 4, 4], [1.0, 2.0, 3.0])
    bins = binning.bin_gaussians(prep, 64, 64, 16, 1 << 10, align=8)
    starts = np.asarray(bins.tile_start)
    assert (starts % 8 == 0).all()
    check_binning(prep, align=8)


def test_capacity_overflow_keeps_nearest():
    """With a tiny pair budget the closest gaussians win (graceful tail drop)."""
    prep = make_prep(
        [[8, 8]] * 10, [4] * 10, list(range(10)),  # all in one tile
    )
    bins = binning.bin_gaussians(prep, 64, 64, 16, max_pairs=4, align=1)
    pg = np.asarray(bins.pair_gaussian)
    starts = np.asarray(bins.tile_start)
    counts = np.asarray(bins.tile_count)
    got = pg[starts[0] : starts[0] + counts[0]].tolist()
    assert got == [0, 1, 2, 3]  # depth order, nearest kept


def test_capacity_boundary_exact_fit_vs_one_over():
    """total == cap takes the no-overflow lax.cond fast path and keeps every
    pair; total == cap + 1 runs the threshold search and drops the deepest
    whole gaussian — the two branches must agree exactly at the boundary."""
    # 4 gaussians x 1 pair each, one tile, distinct depths.
    prep = make_prep([[8, 8]] * 4, [4] * 4, [3.0, 1.0, 2.0, 0.5])
    fit = binning.bin_gaussians(prep, 64, 64, 16, max_pairs=4, align=1)
    assert int(fit.num_pairs) == 4 and int(fit.pair_demand) == 4
    pg = np.asarray(fit.pair_gaussian)[:4].tolist()
    assert pg == [3, 1, 2, 0]  # depth order within the tile

    over = binning.bin_gaussians(prep, 64, 64, 16, max_pairs=3, align=1)
    assert int(over.num_pairs) == 3 and int(over.pair_demand) == 4
    assert np.asarray(over.gaussian_counts).tolist() == [0, 1, 1, 1]  # deepest (id 0, depth 3.0) dropped


def test_binning_stats_and_suggest_max_pairs():
    """Overflow diagnostics report the unclipped pair demand."""
    import jax.numpy as jnp

    from gsplat_tpu import GaussianModel, RasterConfig
    from gsplat_tpu.ops.camera import CameraArrays
    from gsplat_tpu.render.pipeline import binning_stats, suggest_max_pairs
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import orbit_camera, random_splat_arrays

    rng = np.random.default_rng(9)
    model = GaussianModel.from_arrays(random_splat_arrays(rng, 200))
    camera = orbit_camera(0.1, width=64, height=48)
    cam = CameraArrays.from_params(camera)

    big = RasterConfig(tile_size=16, chunk_size=8, pair_block=8, max_pairs=1 << 13, use_pallas=False)
    s = binning_stats(model, cam, 64, 48, big)
    assert not bool(s["overflowed"])
    assert int(s["num_pairs"]) == int(s["pair_demand"]) > 0

    tiny = RasterConfig(tile_size=16, chunk_size=8, pair_block=8, max_pairs=16, use_pallas=False)
    s2 = binning_stats(model, cam, 64, 48, tiny)
    assert bool(s2["overflowed"])
    assert int(s2["pair_demand"]) == int(s["pair_demand"])  # demand is capacity-free
    assert int(s2["num_pairs"]) <= 16

    suggested = suggest_max_pairs(model, camera, tiny, headroom=2.0)
    assert suggested >= int(s["pair_demand"]) * 2 / 2  # pow2 roundup of 2x demand
    assert suggested & (suggested - 1) == 0


def test_strided_tile_ranges_brute_force():
    """strided_tile_ranges must enumerate exactly the shard-owned tiles of
    each rect, for every (stride, offset) and random bboxes."""
    rng = np.random.default_rng(17)
    n, ts, ntx, nty = 200, 16, 9, 7
    w, h = ntx * ts, nty * ts
    x0 = rng.integers(-10, w + 10, n)
    y0 = rng.integers(-10, h + 10, n)
    bbox = np.stack(
        [x0, y0, x0 + rng.integers(0, 80, n), y0 + rng.integers(0, 80, n)], -1
    ).astype(np.int32)
    for sx, sy in [(1, 1), (2, 1), (2, 2), (4, 2), (3, 2)]:
        for ox in range(sx):
            for oy in range(sy):
                lx0, ly0, lnx, lny = binning.strided_tile_ranges(
                    jnp.asarray(bbox), ts, ntx, nty, sx, sy, ox, oy
                )
                gx0, gy0, gnx, gny = binning.tile_ranges(
                    jnp.asarray(bbox), ts, ntx, nty
                )
                for i in range(n):
                    want_x = [t for t in range(int(gx0[i]), int(gx0[i]) + int(gnx[i]))
                              if t % sx == ox]
                    want_y = [t for t in range(int(gy0[i]), int(gy0[i]) + int(gny[i]))
                              if t % sy == oy]
                    got_x = [ox + (int(lx0[i]) + j) * sx for j in range(int(lnx[i]))]
                    got_y = [oy + (int(ly0[i]) + j) * sy for j in range(int(lny[i]))]
                    if int(gnx[i]) == 0 or int(gny[i]) == 0:
                        assert int(lnx[i]) * int(lny[i]) == 0
                    else:
                        assert got_x == want_x, (i, sx, ox, got_x, want_x)
                        assert got_y == want_y, (i, sy, oy, got_y, want_y)


def test_binning_fuzz_random_scenes():
    """Fuzz the binner against the brute-force model across random scenes:
    tie-heavy depths, interleaved culls, alignment, and a strided-shard
    split whose union must reproduce the whole frame's pair lists."""
    for seed in range(5):
        rng = np.random.default_rng(100 + seed)
        n = int(rng.integers(20, 120))
        means = rng.uniform(-8, 72, (n, 2))
        radii = rng.uniform(0, 16, n)
        depths = np.round(rng.uniform(1, 5, n), 1)  # many exact ties
        active = rng.uniform(size=n) < 0.8
        prep = make_prep(means, radii, depths, active)
        align = int(rng.choice([1, 4, 8]))
        check_binning(prep, align=align)

        # Strided shards: every (sx, sy, ox, oy) subset binned independently
        # must equal the whole-frame lists restricted to its tiles.
        w = h = 64
        ts = 16
        ntx = nty = 4
        want = expected_pairs(prep, w, h, ts)
        sx, sy = 2, 2
        for ox in range(sx):
            for oy in range(sy):
                rects = binning.strided_tile_ranges(
                    prep.cull_bbox, ts, ntx, nty, sx, sy, ox, oy
                )
                bins = binning.bin_rects(
                    prep.depth, prep.active, rects,
                    -(-ntx // sx), -(-nty // sy), 1 << 10, align=align,
                )
                pg = np.asarray(bins.pair_gaussian)
                starts = np.asarray(bins.tile_start)
                counts = np.asarray(bins.tile_count)
                ntx_l = -(-ntx // sx)
                for l in range(ntx_l * (-(-nty // sy))):
                    tx = ox + (l % ntx_l) * sx
                    ty = oy + (l // ntx_l) * sy
                    if tx >= ntx or ty >= nty:
                        assert counts[l] == 0
                        continue
                    got = pg[starts[l] : starts[l] + counts[l]].tolist()
                    assert got == want[ty * ntx + tx], (seed, ox, oy, l)


def test_fused_pair_feat_matches_gather():
    """The sort-carried pair slab (``feat_rows=``) must equal
    ``build_pair_feat(feat, pair_gaussian)`` bitwise — same values, same
    block layout, zero rows for sentinels/pads — across random scenes,
    alignments and overflowing capacities."""
    from gsplat_tpu.kernels.raster_fwd import build_pair_feat

    for seed in range(4):
        rng = np.random.default_rng(300 + seed)
        n = int(rng.integers(20, 120))
        means = rng.uniform(-8, 72, (n, 2))
        radii = rng.uniform(0, 16, n)
        depths = np.round(rng.uniform(1, 5, n), 1)
        active = rng.uniform(size=n) < 0.8
        prep = Preprocessed(
            screen_means=jnp.asarray(means, jnp.float32),
            conics=jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
            rgb=jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32),
            opacity=jnp.asarray(rng.uniform(size=n), jnp.float32),
            depth=jnp.asarray(depths, jnp.float32),
            bbox=make_prep(means, radii, depths).bbox,
            cull_bbox=make_prep(means, radii, depths).bbox,
            active=jnp.asarray(active),
        )
        feat = binning.pack_features(prep)
        align = int(rng.choice([4, 8]))
        cap = int(rng.choice([1 << 6, 1 << 10]))  # small cap: overflow case
        bins, pair_feat = binning.bin_gaussians(
            prep, 64, 64, 16, cap, align=align, feat_rows=feat[:-1]
        )
        ref = build_pair_feat(feat, bins.pair_gaussian, align)
        assert pair_feat.shape == ref.shape
        np.testing.assert_array_equal(
            np.asarray(pair_feat), np.asarray(ref), err_msg=str(seed)
        )


def test_expand_segments_matches_reference():
    """The scatter-free windowed decode vs a numpy reference, across
    empty-heavy patterns, tiny windows (forced scatter fallback), and
    slots beyond the emitted pairs."""
    for seed in range(8):
        rng = np.random.default_rng(300 + seed)
        n = int(rng.integers(5, 400))
        # Long empty runs stress the window-overflow detection.
        counts = np.where(
            rng.uniform(size=n) < rng.uniform(0.05, 0.9),
            rng.integers(1, 6, n),
            0,
        ).astype(np.int32)
        total = int(counts.sum())
        num_slots = max(int(total * rng.uniform(0.9, 1.6)) + 1, 8)
        if num_slots < total:
            continue  # expand_segments assumes counts already capacity-clipped

        offsets = np.cumsum(counts) - counts
        gid_ref = np.zeros(num_slots, np.int64)
        off_ref = np.zeros(num_slots, np.int64)
        for i in range(n):
            for k in range(counts[i]):
                gid_ref[offsets[i] + k] = i
                off_ref[offsets[i] + k] = offsets[i]

        for window in (None, 128, 1 << 20):
            gid, seg_off = binning.expand_segments(
                jnp.asarray(counts), num_slots, window=window
            )
            gid = np.asarray(gid)
            seg_off = np.asarray(seg_off)
            # Valid slots must match exactly; slots >= total are masked by
            # callers but must stay in range for the table row gather.
            np.testing.assert_array_equal(gid[:total], gid_ref[:total])
            np.testing.assert_array_equal(seg_off[:total], off_ref[:total])
            assert gid.min() >= 0 and gid.max() < n, (seed, window)


def test_expand_segments_all_empty():
    gid, seg_off = binning.expand_segments(jnp.zeros((17,), jnp.int32), 64)
    assert gid.shape == (64,) and seg_off.shape == (64,)
    assert int(np.asarray(gid).max()) < 17
