"""Per-stage breakdown at real-MipNeRF-360 density (~5M gaussians, ~40M
pairs at 1080p) on the current backend. Scene is generated ON DEVICE
(host->device over the tunneled TPU is ~2 MB/s; a 1.2 GB host scene takes
~12 minutes to ship). Not a test; a tuning tool.

Usage: python scripts/profile_real.py [--n 5000000] [--shift 1.9] [--slack 1.05]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from bench import WIDTH, HEIGHT, bench_camera, build_scene, sized_capacity
from gsplat_tpu import RasterConfig
from gsplat_tpu.ops import binning
from gsplat_tpu.ops.camera import CameraArrays
from gsplat_tpu.render.pipeline import preprocess_traced, render_traced
from gsplat_tpu.kernels.raster import _backward_impl
from gsplat_tpu.kernels.raster_fwd import build_pair_feat, forward_tiles_pallas
from gsplat_tpu.train.loss import rgb_loss
from timing import timed

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5_000_000)
    ap.add_argument("--shift", type=float, default=1.9)
    ap.add_argument("--slack", type=float, default=1.05)
    ap.add_argument("--early-stop", type=float, default=1e-4)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--tile-size", type=int, default=32,
                    help="raster tile edge (16 quarters per-pair pixel work "
                         "at some pair-count growth; re-test at each density)")
    args = ap.parse_args()
    it = args.iters

    model = build_scene(args.n, args.shift)  # bench's on-device generator
    np.asarray(model.means.ravel()[:1])
    log("device scene built")

    cam = CameraArrays.from_params(bench_camera())
    target = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32) + 0.25
    ts = args.tile_size
    cap, demand = sized_capacity(model, cam, headroom=args.slack,
                                 tile_size=ts)
    log(f"demand={demand} ({demand/args.n:.2f} pairs/g) cap={cap} ts={ts}")

    cfg = RasterConfig(
        tile_size=ts, chunk_size=32, max_pairs=cap,
        early_stop_transmittance=args.early_stop,
        use_pallas=jax.default_backend() == "tpu",
        reduce_pairs=cap // 4,
    )
    n_tiles_x = -(-WIDTH // cfg.tile_size)
    n_tiles_y = -(-HEIGHT // cfg.tile_size)
    tile_ids = jnp.arange(n_tiles_x * n_tiles_y, dtype=jnp.int32)

    prep_fn = jax.jit(lambda m, c: preprocess_traced(m, c, WIDTH, HEIGHT, cfg))
    t_prep, prep = timed(prep_fn, model, cam, iters=it)
    log(f"preprocess      {t_prep*1e3:8.1f} ms")

    pack_fn = jax.jit(binning.pack_features)
    t_pack, feat = timed(pack_fn, prep, iters=it)
    log(f"pack_features   {t_pack*1e3:8.1f} ms")

    # Fused binning: features ride the pair sort, slab comes out.
    fused_fn = jax.jit(
        lambda p, f: binning.bin_gaussians(
            p, WIDTH, HEIGHT, cfg.tile_size, cfg.max_pairs,
            align=cfg.pair_block, feat_rows=f,
        )
    )
    t_fused, (bins, pair_feat) = timed(fused_fn, prep, feat[:-1], iters=it)
    log(f"fused binning   {t_fused*1e3:8.1f} ms  (num_pairs {int(bins.num_pairs)})")

    # Unfused reference: plain binning + the P-row feature gather.
    bin_fn = jax.jit(
        lambda p: binning.bin_gaussians(
            p, WIDTH, HEIGHT, cfg.tile_size, cfg.max_pairs, align=cfg.pair_block
        )
    )
    t_bin, _ = timed(bin_fn, prep, iters=it)
    log(f"  plain binning {t_bin*1e3:8.1f} ms")
    gather_fn = jax.jit(lambda f, pg: build_pair_feat(f, pg, cfg.pair_block))
    t_gather, _ = timed(gather_fn, feat, bins.pair_gaussian, iters=it)
    log(f"  + pair gather {t_gather*1e3:8.1f} ms")

    fwd_fn = jax.jit(
        lambda f, pg, pf, ts, tc: forward_tiles_pallas(
            f, pg, ts, tc, tile_ids, n_tiles_x, cfg, pair_feat=pf
        )
    )
    t_fwd, (color, trans, blocks_done) = timed(
        fwd_fn, feat, bins.pair_gaussian, pair_feat, bins.tile_start,
        bins.tile_count, iters=it,
    )
    tot_blocks = int(jnp.sum(-(-bins.tile_count // cfg.pair_block)))
    done_blocks = int(jnp.sum(blocks_done))
    log(f"fwd kernel      {t_fwd*1e3:8.1f} ms  (blocks done {done_blocks}/{tot_blocks})")

    g_color = jnp.ones_like(color) * 0.1
    g_trans = jnp.zeros_like(trans)

    def bwd(c: RasterConfig):
        fn = jax.jit(
            lambda f, pg, pf, ts, tc, col, tr, gc, gt, bd, gcounts: _backward_impl(
                f, pg, ts, tc, tile_ids, col, tr, gc, gt, bd, gcounts,
                n_tiles_x, c, pair_feat=pf,
            )
        )
        return timed(
            fn, feat, bins.pair_gaussian, pair_feat, bins.tile_start,
            bins.tile_count, color, trans, g_color, g_trans, blocks_done,
            bins.gaussian_counts, iters=it,
        )

    t_bwd, _ = bwd(cfg)
    log(f"bwd kernel+compact-reduce {t_bwd*1e3:6.1f} ms")
    t_bwd_full, _ = bwd(RasterConfig(
        tile_size=ts, chunk_size=32, max_pairs=cap,
        early_stop_transmittance=args.early_stop,
        use_pallas=jax.default_backend() == "tpu", reduce_pairs=0,
    ))
    log(f"  full-reduce variant     {t_bwd_full*1e3:6.1f} ms")

    @jax.jit
    def fwd_bwd(m, cam, target):
        def loss_fn(m):
            image, _ = render_traced(m, cam, WIDTH, HEIGHT, cfg)
            return rgb_loss(image, target, 0.2)
        return jax.value_and_grad(loss_fn)(m)

    t_all, (loss, _) = timed(fwd_bwd, model, cam, target, iters=it)
    log(f"full fwd+bwd    {t_all*1e3:8.1f} ms = {1.0/t_all:.3f} fps (loss {float(loss):.4f})")


if __name__ == "__main__":
    main()
