"""Ablate the backward kernel to find where its time goes (TPU only).

Variants (env GSPLAT_BWD_ABLATE):
  none      - full kernel (baseline)
  nowait    - skip put_dma waits (racy; timing only)
  nomatmul  - skip the moment matmul, write d_density row sums placeholder
  noscan    - skip the 3 color cumsums (wrong grads; timing only)
  nodma     - skip the grad write-back entirely (timing only)
"""

from __future__ import annotations

import math
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from timing import timed
from bench import NUM_GAUSSIANS, MAX_PAIRS, WIDTH, HEIGHT, build_scene
from gsplat_tpu import RasterConfig
from gsplat_tpu.ops import binning
from gsplat_tpu.ops.camera import CameraArrays, CameraParams
from gsplat_tpu.render.pipeline import preprocess_traced
from gsplat_tpu.kernels.raster import _forward_impl, _backward_impl


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

    prep = jax.jit(lambda m, c: preprocess_traced(m, c, WIDTH, HEIGHT, cfg))(model, cam)
    bins = jax.jit(
        lambda p: binning.bin_gaussians(
            p, WIDTH, HEIGHT, cfg.tile_size, cfg.max_pairs, align=cfg.chunk_size
        )
    )(prep)
    feat = jax.jit(binning.pack_features)(prep)

    fwd = jax.jit(
        lambda f, pg, ts, tc: _forward_impl(f, pg, ts, tc, tile_ids, n_tiles_x, cfg)
    )
    t, (color, trans, done) = timed(fwd, feat, bins.pair_gaussian, bins.tile_start, bins.tile_count)
    print(f"fwd baseline: {t*1e3:8.1f} ms", flush=True)

    g_color = jnp.ones_like(color) * 0.1
    g_trans = jnp.zeros_like(trans)

    for mode in ["none", "nowait", "nomatmul", "noscan", "nodma"]:
        os.environ["GSPLAT_BWD_ABLATE"] = mode
        # force retrace/recompile
        import importlib
        import gsplat_tpu.kernels.raster_bwd as rb
        importlib.reload(rb)
        bwd = jax.jit(
            lambda f, pg, ts, tc, c, tr, gc, gt, cd: rb.backward_tiles_pallas(
                f, pg, ts, tc, tile_ids, c, tr, gc, gt, n_tiles_x, cfg,
                chunks_done=cd,
            )
        )
        t, _ = timed(
            bwd, feat, bins.pair_gaussian, bins.tile_start, bins.tile_count,
            color, trans, g_color, g_trans, done,
        )
        print(f"bwd {mode:9s}: {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
