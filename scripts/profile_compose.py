"""Why is the fused full forward ~9x slower than the sum of its stages?

Compares: (a) stages jitted separately, (b) stages composed in ONE jit,
(c) render_traced. Also sweeps early-stop and chunk size on the fwd kernel.
"""

from __future__ import annotations

import math
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from bench import NUM_GAUSSIANS, MAX_PAIRS, WIDTH, HEIGHT, build_scene
from gsplat_tpu import RasterConfig
from gsplat_tpu.ops import binning
from gsplat_tpu.ops.camera import CameraArrays, CameraParams
from gsplat_tpu.render.pipeline import preprocess_traced, render_traced
from gsplat_tpu.render.tile_jnp import tiles_to_image
from gsplat_tpu.kernels.raster import _forward_impl


from timing import timed


def main():
    cfg = RasterConfig(
        tile_size=32, chunk_size=32, max_pairs=MAX_PAIRS,
        early_stop_transmittance=1e-4, strict_parity=True, use_pallas=True,
    )
    model = build_scene(NUM_GAUSSIANS)
    fx = 0.8 * WIDTH
    camera = CameraParams(
        width=WIDTH, height=HEIGHT,
        fov_x=2 * math.atan(WIDTH / (2 * fx)), fov_y=2 * math.atan(HEIGHT / (2 * fx)),
        focal_x=fx, focal_y=fx, qvec=(1.0, 0.0, 0.0, 0.0), tvec=(0.0, 0.0, 0.0),
    )
    cam = CameraArrays.from_params(camera)
    n_tiles_x = -(-WIDTH // cfg.tile_size)
    n_tiles_y = -(-HEIGHT // cfg.tile_size)
    tile_ids = jnp.arange(n_tiles_x * n_tiles_y, dtype=jnp.int32)

    def composed(m, c):
        prep = preprocess_traced(m, c, WIDTH, HEIGHT, cfg)
        bins = binning.bin_gaussians(
            prep, WIDTH, HEIGHT, cfg.tile_size, cfg.max_pairs, align=cfg.pair_block
        )
        feat = binning.pack_features(prep)
        color, trans, _, _ = _forward_impl(
            feat, bins.pair_gaussian, bins.tile_start, bins.tile_count,
            tile_ids, n_tiles_x, cfg,
        )
        return tiles_to_image(color, WIDTH, HEIGHT, cfg.tile_size)

    t, _ = timed(jax.jit(composed), model, cam)
    print(f"composed one-jit forward: {t*1e3:8.1f} ms", flush=True)

    t, _ = timed(
        jax.jit(lambda m, c: render_traced(m, c, WIDTH, HEIGHT, cfg)), model, cam
    )
    print(f"render_traced:            {t*1e3:8.1f} ms", flush=True)

    # Stage boundary: precompute prep, fuse bin+pack+kernel.
    prep = jax.jit(lambda m, c: preprocess_traced(m, c, WIDTH, HEIGHT, cfg))(model, cam)
    jax.block_until_ready(prep)

    def tail(p):
        bins = binning.bin_gaussians(
            p, WIDTH, HEIGHT, cfg.tile_size, cfg.max_pairs, align=cfg.pair_block
        )
        feat = binning.pack_features(p)
        return _forward_impl(
            feat, bins.pair_gaussian, bins.tile_start, bins.tile_count,
            tile_ids, n_tiles_x, cfg,
        )

    t, _ = timed(jax.jit(tail), prep)
    print(f"bin+pack+fwd one-jit:     {t*1e3:8.1f} ms", flush=True)

    bins = jax.jit(
        lambda p: binning.bin_gaussians(
            p, WIDTH, HEIGHT, cfg.tile_size, cfg.max_pairs, align=cfg.pair_block
        )
    )(prep)
    jax.block_until_ready(bins)
    print(f"num_pairs={int(bins.num_pairs)}", flush=True)

    # Is it the binning alone when forced to materialize?
    def bin_only(p):
        b = binning.bin_gaussians(
            p, WIDTH, HEIGHT, cfg.tile_size, cfg.max_pairs, align=cfg.pair_block
        )
        return b.pair_gaussian.sum(), b.tile_start.sum(), b.tile_count.sum()

    t, _ = timed(jax.jit(bin_only), prep)
    print(f"binning forced:           {t*1e3:8.1f} ms", flush=True)

    feat = jax.jit(binning.pack_features)(prep)
    jax.block_until_ready(feat)
    fwd = jax.jit(
        lambda f, pg, ts, tc: _forward_impl(f, pg, ts, tc, tile_ids, n_tiles_x, cfg)
    )
    t, _ = timed(fwd, feat, bins.pair_gaussian, bins.tile_start, bins.tile_count)
    print(f"fwd kernel standalone:    {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
