"""Decompose bin_gaussians cost on the real backend with sync timing."""

from __future__ import annotations

import math
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from timing import timed
from bench import NUM_GAUSSIANS, MAX_PAIRS, WIDTH, HEIGHT, build_scene
from gsplat_tpu import RasterConfig
from gsplat_tpu.ops import binning
from gsplat_tpu.ops.camera import CameraArrays, CameraParams
from gsplat_tpu.render.pipeline import preprocess_traced


def main():
    cfg = RasterConfig(tile_size=32, chunk_size=32, max_pairs=MAX_PAIRS,
                       early_stop_transmittance=1e-4, use_pallas=True)
    model = build_scene(NUM_GAUSSIANS)
    fx = 0.8 * WIDTH
    camera = CameraParams(width=WIDTH, height=HEIGHT,
        fov_x=2*math.atan(WIDTH/(2*fx)), fov_y=2*math.atan(HEIGHT/(2*fx)),
        focal_x=fx, focal_y=fx, qvec=(1.0,0.0,0.0,0.0), tvec=(0.0,0.0,0.0))
    cam = CameraArrays.from_params(camera)
    prep = jax.jit(lambda m, c: preprocess_traced(m, c, WIDTH, HEIGHT, cfg))(model, cam)

    n = prep.depth.shape[0]
    ts = cfg.tile_size
    max_pairs = cfg.max_pairs
    n_tiles_x = -(-WIDTH // ts)
    n_tiles_y = -(-HEIGHT // ts)
    num_tiles = n_tiles_x * n_tiles_y

    t, depth_order = timed(jax.jit(lambda d: jnp.argsort(d).astype(jnp.int32)), prep.depth)
    print(f"1. depth argsort [{n}]:        {t*1e3:7.1f} ms", flush=True)

    @jax.jit
    def stage2(prep, depth_order):
        tx0, ty0, ntx, nty = binning.tile_ranges(prep.bbox, ts, n_tiles_x, n_tiles_y)
        counts = jnp.where(prep.active, ntx * nty, 0).astype(jnp.int32)
        counts_d = counts[depth_order]
        tx0_d = tx0[depth_order]
        ty0_d = ty0[depth_order]
        ntx_d = ntx[depth_order]
        offsets = jnp.cumsum(counts_d) - counts_d
        return counts_d, tx0_d, ty0_d, ntx_d, offsets

    t, (counts_d, tx0_d, ty0_d, ntx_d, offsets) = timed(stage2, prep, depth_order)
    print(f"2. ranges+gathers+cumsum [N]:  {t*1e3:7.1f} ms", flush=True)

    @jax.jit
    def stage3(counts_d, offsets, tx0_d, ty0_d, ntx_d):
        num_pairs = jnp.minimum(offsets[-1] + counts_d[-1], max_pairs).astype(jnp.int32)
        rank_iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        markers = jnp.zeros((max_pairs,), dtype=jnp.int32)
        starts = jnp.where(counts_d > 0, offsets, max_pairs)
        markers = markers.at[starts].max(rank_iota, mode="drop")
        pair_rank = jax.lax.cummax(markers)
        slot = jax.lax.broadcasted_iota(jnp.int32, (max_pairs, 1), 0).squeeze(-1)
        valid = slot < num_pairs
        pair_rank = jnp.where(valid, pair_rank, 0)
        local = slot - offsets[pair_rank]
        w = jnp.maximum(ntx_d[pair_rank], 1)
        tile_x = tx0_d[pair_rank] + local % w
        tile_y = ty0_d[pair_rank] + local // w
        tile_id = jnp.where(valid, tile_y * n_tiles_x + tile_x, num_tiles)
        return tile_id, pair_rank, valid, num_pairs

    t, (tile_id, pair_rank, valid, num_pairs) = timed(stage3, counts_d, offsets, tx0_d, ty0_d, ntx_d)
    print(f"3. scatter+cummax+expand [P]:  {t*1e3:7.1f} ms", flush=True)

    t, order = timed(jax.jit(lambda k: jnp.argsort(k, stable=True)), tile_id)
    print(f"4. stable argsort [P]:         {t*1e3:7.1f} ms", flush=True)

    @jax.jit
    def stage5(tile_id, order, valid, pair_rank, depth_order):
        sorted_tile_id = tile_id[order]
        pair_gaussian = jnp.where(valid[order], depth_order[pair_rank[order]], jnp.int32(n))
        tile_idx = jax.lax.broadcasted_iota(jnp.int32, (num_tiles, 1), 0).squeeze(-1)
        tile_start = jnp.searchsorted(sorted_tile_id, tile_idx, side="left").astype(jnp.int32)
        tile_end = jnp.searchsorted(sorted_tile_id, tile_idx, side="right").astype(jnp.int32)
        return sorted_tile_id, pair_gaussian, tile_start, tile_end - tile_start

    t, (sorted_tile_id, pair_gaussian, tile_start, tile_count) = timed(
        stage5, tile_id, order, valid, pair_rank, depth_order)
    print(f"5. apply order + searchsorted: {t*1e3:7.1f} ms", flush=True)

    align = cfg.chunk_size

    @jax.jit
    def stage6(sorted_tile_id, pair_gaussian, tile_start, tile_count):
        aligned_count = -(-tile_count // align) * align
        aligned_start = (jnp.cumsum(aligned_count) - aligned_count).astype(jnp.int32)
        slot_pos = jax.lax.broadcasted_iota(jnp.int32, (max_pairs, 1), 0).squeeze(-1)
        in_range = sorted_tile_id < num_tiles
        tid = jnp.minimum(sorted_tile_id, num_tiles - 1)
        new_pos = aligned_start[tid] + (slot_pos - tile_start[tid])
        new_pos = jnp.where(in_range, new_pos, max_pairs)
        aligned_pairs = jnp.full((max_pairs,), jnp.int32(n))
        aligned_pairs = aligned_pairs.at[new_pos].set(pair_gaussian, mode="drop")
        return aligned_pairs, aligned_start

    t, _ = timed(stage6, sorted_tile_id, pair_gaussian, tile_start, tile_count)
    print(f"6. align re-scatter [P]:       {t*1e3:7.1f} ms", flush=True)

    # reference: full binning
    t, bins = timed(jax.jit(lambda p,: binning.bin_gaussians(p, WIDTH, HEIGHT, ts, max_pairs, align=align)), prep)
    print(f"total bin_gaussians:           {t*1e3:7.1f} ms", flush=True)

    # sort size sensitivity
    for P in [1 << 21, 1 << 20]:
        keys = tile_id[:P]
        t, _ = timed(jax.jit(lambda k: jnp.argsort(k, stable=True)), keys)
        print(f"   stable argsort [{P}]:    {t*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
