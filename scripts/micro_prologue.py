"""Stage breakdown of the replicated binning prologue (SCALING_r04 Amdahl tail).

The tile-sharded step's only N-scale replicated work is the sortless
prologue inside ``ops/binning.bin_rects`` (parallel/shard.py docstring):
per-gaussian rects/counts, the segment-start scatter, and the MXU
separable histogram. SCALING_r04.json measures it at a CONSTANT ~8.5 ms
across tile factors — 36% of the ideal 8-device step, capping tile-axis
efficiency at 67% vs the >=80% BASELINE.md target. This script times each
candidate inside that lump on the real chip so the optimization attacks
the right stage:

  rects      — strided_tile_ranges + counts + dkey (elementwise O(N))
  scatter    — markers.at[starts].max(iota) segment-start scatter (O(N)
               scattered elements into a [max_pairs] buffer)
  histogram  — the separable-mask MXU tile histogram (masks are built at
               the PADDED lane width today: [N, 128] bf16 regardless of the
               local grid's ntx_l, binning.py:334-349)
  histogram_tight — same matmul with masks padded only to the local grid
  prologue   — the whole bin_rects with zero active gaussians (the
               SCALING measurement's definition)

Usage:  python scripts/micro_prologue.py [--gaussians 1000000] [--tp 1,8]
Output: one JSON line per tile factor.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=1_000_000)
    ap.add_argument("--tp", default="1,8")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--max-pairs", type=int, default=1 << 21)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_scene, bench_camera
    from gsplat_tpu import RasterConfig
    from gsplat_tpu.ops import binning
    from gsplat_tpu.ops.camera import CameraArrays
    from gsplat_tpu.parallel.shard import _make_layout
    from gsplat_tpu.render.pipeline import preprocess_traced
    from timing import timed

    cfg = RasterConfig(tile_size=32, chunk_size=32, max_pairs=args.max_pairs,
                       use_pallas=jax.default_backend() == "tpu")
    model = build_scene(args.gaussians)
    cam = CameraArrays.from_params(bench_camera())
    prep = jax.jit(
        lambda m, c: preprocess_traced(m, c, args.width, args.height, cfg)
    )(model, cam)

    tiny = jnp.ones((8, 128), jnp.float32)
    floor, _ = timed(jax.jit(lambda x: x + 1.0), tiny)

    def net(t):
        return max(t - floor, 0.0)

    i32 = jnp.int32
    results = []
    for tp in [int(x) for x in args.tp.split(",")]:
        lay = _make_layout(args.width, args.height, cfg.tile_size, tp)
        local_cap = max(args.max_pairs // tp, 1 << 16)
        local_cap -= local_cap % cfg.pair_block

        def rects_fn(p):
            r = binning.strided_tile_ranges(
                p.cull_bbox, cfg.tile_size, lay.ntx_g, lay.nty_g,
                lay.sx, lay.sy, 0, 0,
            )
            counts = jnp.where(p.active, r[2] * r[3], 0).astype(i32)
            bits = jax.lax.bitcast_convert_type(
                p.depth.astype(jnp.float32), jnp.uint32
            )
            dkey = jnp.where(
                (bits & jnp.uint32(0x80000000)) != 0,
                ~bits, bits | jnp.uint32(0x80000000),
            )
            return r, counts, jnp.sum(counts), dkey

        t_rects, (rects, counts, total, dkey) = timed(jax.jit(rects_fn), prep)
        counts, total = jax.block_until_ready((counts, total))
        tx0, ty0, ntx, nty = rects

        def scatter_fn(counts):
            offsets = jnp.cumsum(counts) - counts
            markers = jnp.zeros((local_cap,), dtype=i32)
            starts = jnp.where(counts > 0, offsets, local_cap)
            iota_n = jax.lax.broadcasted_iota(i32, (counts.shape[0], 1), 0)
            markers = markers.at[starts].max(iota_n.squeeze(-1), mode="drop")
            return jax.lax.cummax(markers)

        t_scatter, _ = timed(jax.jit(scatter_fn), counts)

        def hist(tx0, ty0, ntx, nty, counts, ntxp, ntyp):
            txc = jax.lax.broadcasted_iota(i32, (1, ntxp), 1)
            tyc = jax.lax.broadcasted_iota(i32, (1, ntyp), 1)
            keep = (counts > 0)[:, None]
            x_mask = (
                (txc >= tx0[:, None]) & (txc < (tx0 + ntx)[:, None]) & keep
            ).astype(jnp.bfloat16)
            y_mask = (
                (tyc >= ty0[:, None]) & (tyc < (ty0 + nty)[:, None]) & keep
            ).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                y_mask, x_mask,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        from functools import partial

        pad128 = -(-lay.ntx_l // 128) * 128
        pad8 = -(-lay.nty_l // 8) * 8
        t_hist, _ = timed(
            jax.jit(partial(hist, ntxp=pad128, ntyp=pad8)),
            tx0, ty0, ntx, nty, counts,
        )
        t_hist_tight, _ = timed(
            jax.jit(partial(hist, ntxp=lay.ntx_l, ntyp=lay.nty_l)),
            tx0, ty0, ntx, nty, counts,
        )

        def prologue_only(p):
            r = binning.strided_tile_ranges(
                p.cull_bbox, cfg.tile_size, lay.ntx_g, lay.nty_g,
                lay.sx, lay.sy, 0, 0,
            )
            return binning.bin_rects(
                p.depth, jnp.zeros_like(p.active), r, lay.ntx_l, lay.nty_l,
                cfg.pair_block, align=cfg.pair_block,
            )

        t_pro, _ = timed(jax.jit(prologue_only), prep)

        results.append({
            "tp": tp, "ntx_l": lay.ntx_l, "nty_l": lay.nty_l,
            "local_cap": local_cap,
            "rects_ms": round(net(t_rects) * 1e3, 2),
            "scatter_ms": round(net(t_scatter) * 1e3, 2),
            "hist_pad128_ms": round(net(t_hist) * 1e3, 2),
            "hist_tight_ms": round(net(t_hist_tight) * 1e3, 2),
            "prologue_bin_rects_ms": round(net(t_pro) * 1e3, 2),
        })
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({
        "mode": "micro_prologue", "gaussians": args.gaussians,
        "dispatch_floor_ms": round(floor * 1e3, 2), "points": results,
    }))


if __name__ == "__main__":
    main()
