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
    ap.add_argument("--bwd-stages", action="store_true",
                    help="time the sliced backward's stages one by one")
    ap.add_argument("--fwd-stages", action="store_true",
                    help="time the sliced forward's N-scale prologue pieces")
    ap.add_argument("--decompose", action="store_true",
                    help="isolate non-rasterizer costs of the fwd+bwd step")
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

        from gsplat_tpu.render.pipeline import preprocess_traced
        from gsplat_tpu.ops import binning as B
        from gsplat_tpu.render.sliced import (
            _forward_impl, _grid, _prepare_sliced,
        )

        s = int(args.slices.split(",")[0])
        c = cfg(slice_pairs=s)
        prep = jax.jit(
            lambda m, cm: preprocess_traced(m, cm, WIDTH, HEIGHT, c)
        )(model, cam)
        feat = B.pack_features(prep).astype(jnp.float32)
        n = args.n
        ntxg, ntyg, _nt = _grid(WIDTH, HEIGHT, 32)
        order, w0s, w1s = _prepare_sliced(prep, 32, ntxg, ntyg)

        fwd = jax.jit(
            lambda f, o, a, b: _forward_impl(f, o, a, b, WIDTH, HEIGHT, c)[2]
        )
        out = fwd(feat, order, w0s, w1s)
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

    if args.bwd_stages:
        _bwd_stage_probe(args, model, cam, cfg)
        return

    if args.fwd_stages:
        _fwd_stage_probe(args, model, cam, cfg)
        return

    if args.decompose:
        from timing import timed

        from gsplat_tpu.ops import binning as B
        from gsplat_tpu.render.pipeline import preprocess_traced, render_traced
        from gsplat_tpu.train.loss import rgb_loss

        s0 = int(args.slices.split(",")[0])
        c = cfg(slice_pairs=s0, reduce_pairs=args.reduce)

        # (a) full production step (reference point)
        el, _ = time_fwd_bwd(model, cam, target, c, iters=args.iters)
        log(f"full fwd+bwd (L1+SSIM)      {el*1e3:8.1f} ms")

        # (b) same but plain sum loss — isolates the loss's cost
        @jax.jit
        def fb_sum(m, cm):
            def loss_fn(mm):
                img, _ = render_traced(mm, cm, WIDTH, HEIGHT, c)
                return jnp.sum(img * 0.1)
            return jax.value_and_grad(loss_fn)(m)
        t_b, _ = timed(fb_sum, model, cam, iters=args.iters)
        log(f"fwd+bwd, sum loss           {t_b*1e3:8.1f} ms")

        # (c) preprocess+pack fwd+bwd alone — the N-scale autodiff chain
        @jax.jit
        def pp(m, cm):
            def loss_fn(mm):
                prep = preprocess_traced(mm, cm, WIDTH, HEIGHT, c)
                return jnp.sum(B.pack_features(prep) * 0.1)
            return jax.value_and_grad(loss_fn)(m)
        t_c, _ = timed(pp, model, cam, iters=args.iters)
        log(f"preprocess+pack fwd+bwd     {t_c*1e3:8.1f} ms")

        # (d) render fwd only (context)
        fwd_only = jax.jit(
            lambda m, cm: render_traced(m, cm, WIDTH, HEIGHT, c)[0])
        t_d, _ = timed(fwd_only, model, cam, iters=args.iters)
        log(f"render fwd only             {t_d*1e3:8.1f} ms")
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


def _fwd_stage_probe(args, model, cam, cfg):
    """Time the sliced forward's fixed N-scale prologue pieces + the loop."""
    from timing import timed

    from gsplat_tpu.ops import binning as B
    from gsplat_tpu.render.pipeline import preprocess_traced, render_traced
    from gsplat_tpu.render.sliced import (
        _forward_impl, _grid, _monotone_depth_key,
    )

    s = int(args.slices.split(",")[0])
    c = cfg(slice_pairs=s, reduce_pairs=args.reduce)
    it = args.iters
    n = args.n
    ntxg, ntyg, _ = _grid(WIDTH, HEIGHT, 32)

    prep_fn = jax.jit(lambda m, cm: preprocess_traced(m, cm, WIDTH, HEIGHT, c))
    t_prep, prep = timed(prep_fn, model, cam, iters=it)
    log(f"preprocess (N)            {t_prep*1e3:8.1f} ms")

    t_pack, feat = timed(jax.jit(B.pack_features), prep, iters=it)
    log(f"pack_features (N)         {t_pack*1e3:8.1f} ms")

    iota = jnp.arange(n, dtype=jnp.int32)

    def depth_sort(d):
        return jax.lax.sort(
            (_monotone_depth_key(d), iota), num_keys=1, is_stable=True
        )[1]

    t_ds, order = timed(jax.jit(depth_sort), prep.depth, iters=it)
    log(f"depth sort (N, 2-op)      {t_ds*1e3:8.1f} ms")

    t_inv, _ = timed(
        jax.jit(lambda o: jax.lax.sort((o, iota), num_keys=1)[1]),
        order, iters=it,
    )
    log(f"inverse sort (N, 2-op)    {t_inv*1e3:8.1f} ms")

    t_invs, _ = timed(
        jax.jit(lambda o: jnp.zeros((n,), jnp.int32).at[o].set(iota)),
        order, iters=it,
    )
    log(f"inverse SCATTER (N)       {t_invs*1e3:8.1f} ms")

    def table_build(f, o):
        return jnp.concatenate(
            [iota[:, None] % 8, iota[:, None] % 4, iota[:, None] % 2,
             jax.lax.bitcast_convert_type(
                 f[:-1][o][:, : B.NUM_LIVE_FEATURES].astype(jnp.float32),
                 jnp.int32)],
            axis=1,
        )
    t_tb, _ = timed(jax.jit(table_build), feat, order, iters=it)
    log(f"table gather+build (N,16) {t_tb*1e3:8.1f} ms")

    def rect_perm(p, o):
        tx0, ty0, ntx, nty = B.tile_ranges(p.cull_bbox, 32, ntxg, ntyg)
        cnt = jnp.where(p.active, ntx * nty, 0).astype(jnp.int32)
        return cnt[o], tx0[o], ty0[o], ntx[o], nty[o]

    t_rp, _ = timed(jax.jit(rect_perm), prep, order, iters=it)
    log(f"rects+counts permute (N)  {t_rp*1e3:8.1f} ms  [legacy cost]")

    from gsplat_tpu.render.sliced import _prepare_sliced

    t_aux, sorted3 = timed(
        jax.jit(lambda p: _prepare_sliced(p, 32, ntxg, ntyg)), prep, iters=it)
    log(f"prepare (4-op depth sort) {t_aux*1e3:8.1f} ms")

    fwd = jax.jit(
        lambda f, o, a, b: _forward_impl(f, o, a, b, WIDTH, HEIGHT, c)[:2]
    )
    t_loop, _ = timed(fwd, jnp.asarray(feat, jnp.float32), *sorted3, iters=it)
    log(f"slice loop                {t_loop*1e3:8.1f} ms")

    fwd_full = jax.jit(lambda m, cm: render_traced(m, cm, WIDTH, HEIGHT, c)[0])
    t_all, _ = timed(fwd_full, model, cam, iters=it)
    log(f"render_traced fwd total   {t_all*1e3:8.1f} ms")


def _bwd_stage_probe(args, model, cam, cfg):
    """Time the sliced backward's stages on slice 0's real data."""
    from timing import timed

    from gsplat_tpu.kernels.raster_bwd import (
        backward_tiles_carry, pack_tile_rows, reduction_basis,
    )
    from gsplat_tpu.kernels.raster_fwd import build_pair_feat
    from gsplat_tpu.ops import binning as B
    from gsplat_tpu.render.pipeline import preprocess_traced
    from gsplat_tpu.render.sliced import (
        _forward_impl, _grid, _prepare_sliced, _sizes,
    )

    s = int(args.slices.split(",")[0])
    c = cfg(slice_pairs=s)
    it = args.iters
    ts = 32
    ntxg, ntyg, num_tiles = _grid(WIDTH, HEIGHT, ts)
    align, s_cap, k_max, padcap, p_buf, nblk_s, s_store = _sizes(c, num_tiles)

    prep = jax.jit(lambda m, cm: preprocess_traced(m, cm, WIDTH, HEIGHT, c))(
        model, cam
    )
    from gsplat_tpu.ops import binning as _B

    feat = _B.pack_features(prep).astype(jnp.float32)
    n = args.n
    iota = jnp.arange(n, dtype=jnp.int32)
    order, w0s, w1s = _prepare_sliced(prep, ts, ntxg, ntyg)
    tx0, ty0, ntx, nty = B.tile_ranges(prep.cull_bbox, ts, ntxg, ntyg)
    counts = jnp.where(prep.active, ntx * nty, 0).astype(jnp.int32)

    fwd = jax.jit(
        lambda f, o, a, b: _forward_impl(f, o, a, b, WIDTH, HEIGHT, c)
    )
    t_fwd, (color, trans, out) = timed(fwd, feat, order, w0s, w1s, iters=it)
    log(f"fwd loop total        {t_fwd*1e3:8.1f} ms  (k={int(out['k'])})")

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    g_color = jnp.ones_like(color) * 0.1
    g_trans = jnp.zeros_like(trans)
    g_out = pack_tile_rows(g_color, g_trans)
    basis = reduction_basis(g_color, ts)
    fwd_out = pack_tile_rows(color, trans)
    row0 = jnp.sum(g_out[:, 0:4, :] * fwd_out[:, 0:4, :], axis=1)
    carry = jnp.stack([row0, jnp.ones_like(row0)], axis=1)
    feat32 = feat.astype(jnp.float32)  # ids are ORIGINAL gaussian ids
    ids0 = out["ids"][0]

    gather_fn = jax.jit(lambda f, i: build_pair_feat(f, i, align)[:nblk_s])
    t_g, pair_feat = timed(gather_fn, feat32, ids0, iters=it)
    log(f"slice regather        {t_g*1e3:8.1f} ms")

    kern = jax.jit(lambda pf, st, tc, bd, go, ba, ca: backward_tiles_carry(
        pf, st, tc, tile_ids, bd, go, ba, ca, ntxg, c))
    t_k, (pair_grads, _) = timed(
        kern, pair_feat, out["starts"][0], out["countc"][0], out["bdone"][0],
        g_out, basis, carry, iters=it,
    )
    log(f"bwd kernel (slice 0)  {t_k*1e3:8.1f} ms")

    def reduction(pg, idk, st0, bd0):
        delta = jnp.zeros((s_store + 1,), jnp.int32)
        delta = delta.at[st0].add(1, mode="drop")
        delta = delta.at[st0 + bd0 * align].add(-1, mode="drop")
        written = jnp.cumsum(delta[:-1]) > 0
        cols = [jnp.where(written, pg[:, j, :].reshape(-1), 0.0)
                for j in range(9)]
        sorted_c = jax.lax.sort((idk, *cols), num_keys=1, is_stable=False)
        cum9 = jnp.stack([jnp.cumsum(cc) for cc in sorted_c[1:]], axis=1)
        ends = jnp.cumsum(counts)  # stand-in [N] cumsum + gather
        at = jnp.maximum(ends - 1, 0)
        return jnp.where((ends > 0)[:, None], cum9[at % cum9.shape[0]], 0.0)

    t_r, _ = timed(jax.jit(reduction), pair_grads, ids0, out["starts"][0],
                   out["bdone"][0], iters=it)
    log(f"per-slice reduction   {t_r*1e3:8.1f} ms")

    def alive_cost(d0):
        from gsplat_tpu.render.sliced import (
            _alive_mask, _rect_bits, _slice_counts,
        )

        bxw, byw = _rect_bits(ntxg, ntyg)
        mskx = (1 << bxw) - 1
        msky = (1 << byw) - 1
        tx0s = w0s & mskx
        ty0s = (w0s >> bxw) & msky
        ntxs = w1s & mskx
        ntys = (w1s >> bxw) & msky
        act = (w1s >> (bxw + byw)) & 1
        cnts = jnp.where(act == 1, ntxs * ntys, 0)
        alive = _alive_mask(d0, out["gb"][0], iota, tx0s, ty0s,
                            ntxs, ntys, ntxg, ntyg, 1e-4)
        cnt_k, _ = _slice_counts(alive, out["gb"][1], cnts, iota)
        return jnp.cumsum(cnt_k)[-1]

    t_a, _ = timed(jax.jit(alive_cost), out["dsnap"][0], iters=it)
    log(f"alive+cumsum (N)      {t_a*1e3:8.1f} ms")
    log(f"composited blocks     {int(np.asarray(out['bdone']).sum())} "
        f"(slices {int(out['k'])}, pairs "
        f"{int(np.asarray(out['bdone']).sum()) * align})")


if __name__ == "__main__":
    main()
