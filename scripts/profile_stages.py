"""Per-stage wall-clock breakdown of the bench workload on the current backend.

Times each pipeline stage in isolation (jitted, block_until_ready) so we know
where the 1080p fwd+bwd frame time goes. Not a test; a tuning tool.
"""

from __future__ import annotations

import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from bench import NUM_GAUSSIANS, MAX_PAIRS, WIDTH, HEIGHT, build_scene
from gsplat_tpu import RasterConfig
from gsplat_tpu.models.gaussians import GaussianModel
from gsplat_tpu.ops import binning
from gsplat_tpu.ops.camera import CameraArrays, CameraParams
from gsplat_tpu.render.pipeline import preprocess_traced, render_traced
from gsplat_tpu.kernels.raster import _forward_impl, _backward_impl
from gsplat_tpu.train.loss import rgb_loss


from timing import timed


def main():
    cfg = RasterConfig(
        tile_size=32, chunk_size=32, max_pairs=MAX_PAIRS,
        early_stop_transmittance=1e-4, strict_parity=True,
        use_pallas=jax.default_backend() == "tpu",
    )
    model = build_scene(NUM_GAUSSIANS)
    fx = 0.8 * WIDTH
    camera = CameraParams(
        width=WIDTH, height=HEIGHT,
        fov_x=2 * math.atan(WIDTH / (2 * fx)), fov_y=2 * math.atan(HEIGHT / (2 * fx)),
        focal_x=fx, focal_y=fx, qvec=(1.0, 0.0, 0.0, 0.0), tvec=(0.0, 0.0, 0.0),
    )
    cam = CameraArrays.from_params(camera)
    target = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32) + 0.25
    n_tiles_x = -(-WIDTH // cfg.tile_size)
    n_tiles_y = -(-HEIGHT // cfg.tile_size)
    tile_ids = jnp.arange(n_tiles_x * n_tiles_y, dtype=jnp.int32)

    prep_fn = jax.jit(
        lambda m, c: preprocess_traced(m, c, WIDTH, HEIGHT, cfg)
    )
    t_prep, prep = timed(prep_fn, model, cam)

    bin_fn = jax.jit(
        lambda p: binning.bin_gaussians(
            p, WIDTH, HEIGHT, cfg.tile_size, cfg.max_pairs, align=cfg.pair_block
        )
    )
    t_bin, bins = timed(bin_fn, prep)
    print(f"num_pairs = {int(bins.num_pairs)} / {MAX_PAIRS}", flush=True)

    pack_fn = jax.jit(binning.pack_features)
    t_pack, feat = timed(pack_fn, prep)

    fwd_fn = jax.jit(
        lambda f, pg, ts, tc: _forward_impl(f, pg, ts, tc, tile_ids, n_tiles_x, cfg)
    )
    t_fwd, (color, trans, blocks_done, _pf) = timed(fwd_fn, feat, bins.pair_gaussian, bins.tile_start, bins.tile_count)

    g_color = jnp.ones_like(color) * 0.1
    g_trans = jnp.zeros_like(trans)
    bwd_fn = jax.jit(
        lambda f, pg, ts, tc, c, t, gc, gt, cd, gcounts: _backward_impl(
            f, pg, ts, tc, tile_ids, c, t, gc, gt, cd, gcounts, n_tiles_x, cfg
        )
    )
    t_bwd, _ = timed(
        bwd_fn, feat, bins.pair_gaussian, bins.tile_start, bins.tile_count,
        color, trans, g_color, g_trans, blocks_done, bins.gaussian_counts,
    )

    # Full fwd+bwd for reference.
    @jax.jit
    def fwd_bwd(m, cam, target):
        def loss_fn(m):
            image, _ = render_traced(m, cam, WIDTH, HEIGHT, cfg)
            return rgb_loss(image, target, 0.2)
        return jax.value_and_grad(loss_fn)(m)

    t_all, _ = timed(fwd_bwd, model, cam, target, iters=5)

    # Forward-only full render.
    rfn = jax.jit(lambda m, c: render_traced(m, c, WIDTH, HEIGHT, cfg))
    t_render, _ = timed(rfn, model, cam)

    print(f"preprocess      {t_prep*1e3:8.1f} ms")
    print(f"binning         {t_bin*1e3:8.1f} ms")
    print(f"pack_features   {t_pack*1e3:8.1f} ms")
    print(f"fwd kernel(+gather) {t_fwd*1e3:8.1f} ms")
    print(f"bwd kernel(+scatter){t_bwd*1e3:8.1f} ms")
    print(f"full forward    {t_render*1e3:8.1f} ms")
    print(f"full fwd+bwd    {t_all*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
