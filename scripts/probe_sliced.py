"""On-chip probe: depth-sliced pipeline vs the standard production config
at real MipNeRF-360 density (5M gaussians, ~40M pairs, 1080p).

Measures full fwd+bwd steps (render + loss + grads) for the round-3
production config (single-sort, early-stop + compacted reduction) and the
sliced pipeline at several slice capacities. Not a test; a tuning tool.

Usage: python scripts/probe_sliced.py [--n 5000000] [--slices 2097152,4194304]
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

from bench import (
    HEIGHT, WIDTH, bench_camera, build_scene, sized_capacity, time_fwd_bwd,
)
from gsplat_tpu import RasterConfig
from gsplat_tpu.ops.camera import CameraArrays

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
    ap.add_argument("--slices", default="2097152,4194304,8388608")
    ap.add_argument("--skip-standard", action="store_true")
    ap.add_argument("--diag", action="store_true",
                    help="run the slice loop once and dump per-slice stats")
    ap.add_argument("--stages", action="store_true",
                    help="time forward-only vs fwd+bwd for each slice size")
    ap.add_argument("--reduce", type=int, default=0,
                    help="cross-slice compact reduction capacity (pairs)")
    args = ap.parse_args()

    model = build_scene(args.n, args.shift)
    np.asarray(model.means.ravel()[:1])
    log("device scene built")
    cam = CameraArrays.from_params(bench_camera())
    target = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32) + 0.25
    cap, demand = sized_capacity(model, cam, headroom=args.slack)
    log(f"demand={demand} ({demand/args.n:.2f} pairs/g) cap={cap}")

    def cfg(slice_pairs=0, reduce_pairs=0):
        return RasterConfig(
            tile_size=32, chunk_size=32, max_pairs=cap,
            early_stop_transmittance=args.early_stop,
            use_pallas=True, reduce_pairs=reduce_pairs,
            slice_pairs=slice_pairs,
        )

    if not args.skip_standard:
        el, loss = time_fwd_bwd(model, cam, target,
                                cfg(reduce_pairs=cap // 4), iters=args.iters)
        log(f"standard (single-sort, compact-reduce): {el*1e3:8.1f} ms/frame "
            f"= {1/el:.3f} fps  (loss {loss:.5f})")

    if args.diag:
        import math

        from gsplat_tpu.ops import binning as B
        from gsplat_tpu.render.pipeline import preprocess_traced
        from gsplat_tpu.render.sliced import _forward_impl, _monotone_depth_key

        s = int(args.slices.split(",")[0])
        c = cfg(slice_pairs=s)
        prep = jax.jit(
            lambda m, cm: preprocess_traced(m, cm, WIDTH, HEIGHT, c)
        )(model, cam)
        feat = B.pack_features(prep)
        n = args.n
        iota = jnp.arange(n, dtype=jnp.int32)
        order = jax.lax.sort(
            (_monotone_depth_key(prep.depth), iota), num_keys=1, is_stable=True
        )[1]
        ntxg, ntyg = -(-WIDTH // 32), -(-HEIGHT // 32)
        tx0, ty0, ntx, nty = B.tile_ranges(prep.cull_bbox, 32, ntxg, ntyg)
        counts = jnp.where(prep.active, ntx * nty, 0).astype(jnp.int32)

        fwd = jax.jit(lambda f, o, cn, a, b_, cc, d: _forward_impl(
            f, o, cn, a, b_, cc, d, WIDTH, HEIGHT, c)[2])
        out = fwd(feat, order, counts[order], tx0[order], ty0[order],
                  ntx[order], nty[order])
        k = int(out["k"])
        k_max = math.ceil(c.max_pairs / s)
        log(f"diag slice_pairs={s}: slices executed {k}/{k_max}, "
            f"g0 end {int(out['g0'])}/{n}")
        gb = np.asarray(out["gb"])[: k + 1]
        dsnap = np.asarray(out["dsnap"])  # done at slice entry
        countc = np.asarray(out["countc"])
        bdone = np.asarray(out["bdone"])
        T = dsnap.shape[1]
        final_done = int(np.asarray(out["done"]).sum())
        for i in range(k):
            log(f"  slice {i}: gaussians [{gb[i]},{gb[i+1]}) "
                f"emitted_pairs={int(countc[i].sum())} "
                f"done_tiles_at_entry={int(dsnap[i].sum())}/{T} "
                f"blocks_composited={int(bdone[i].sum())}")
        log(f"  final done tiles: {final_done}/{T}")
        return

    for s in [int(x) for x in args.slices.split(",") if x]:
        try:
            if args.stages:
                from gsplat_tpu.render.pipeline import render_traced
                from timing import timed

                c = cfg(slice_pairs=s, reduce_pairs=args.reduce)
                fwd_only = jax.jit(
                    lambda m, cm: render_traced(m, cm, WIDTH, HEIGHT, c)[0]
                )
                t_f, _ = timed(fwd_only, model, cam, iters=args.iters)
                log(f"sliced slice_pairs={s:>9} fwd-only: {t_f*1e3:8.1f} ms")
            el, loss = time_fwd_bwd(
                model, cam, target,
                cfg(slice_pairs=s, reduce_pairs=args.reduce), iters=args.iters)
            log(f"sliced slice_pairs={s:>9}: {el*1e3:8.1f} ms/frame "
                f"= {1/el:.3f} fps  (loss {loss:.5f})")
        except Exception as exc:
            log(f"sliced slice_pairs={s}: FAILED {type(exc).__name__}: {exc}")


if __name__ == "__main__":
    main()
