"""Multi-chip / multi-host scaling harness (SURVEY.md §5.8, BASELINE.md
scaling target: >= 80% rays/s efficiency from 1 chip to >= 2 hosts).

Three modes:

* ``--mode virtual`` (default; no hardware needed) — build (data x tile)
  meshes over virtual CPU devices for each requested device count, run the
  full sharded train step, and verify gradients/losses are mesh-shape
  invariant. This validates the *structure* (shardings compile + execute,
  collectives correct); CPU wall-clock is not a scaling measurement because
  all virtual devices share one host's cores.

      XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
          python scripts/multihost.py --mode virtual --devices 1,2,4,8

* ``--mode model`` (one real chip) — measure the sharded step's Amdahl
  decomposition on real hardware: time the replicated per-step work (the
  sortless O(N) binning prologue over all N gaussians) and the per-shard work
  (preprocess of N/tp gaussians, binning + raster of the 1/tp strided tile
  subset) for each tp, then report projected step time, pixels/s/chip and
  scaling efficiency. This is the honest single-chip measurement vehicle
  for the >= 80% target until a multi-chip slice is attached.

      python scripts/multihost.py --mode model --devices 1,2,4,8

* ``--mode launch`` (real multi-host slice) — call per host:

      COORDINATOR_ADDRESS=host0:8476 NUM_PROCESSES=2 PROCESS_ID=<i> \
          python scripts/multihost.py --mode launch --data 2 --tile 4

  wires jax.distributed from those env vars, builds the requested mesh over
  the global device set, times the sharded train step, and reports
  pixels/s (host 0 prints the JSON).

Output: one JSON line with per-device-count points.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np


def _flags():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["virtual", "model", "launch"], default="virtual")
    ap.add_argument("--devices", default="1,2,4,8",
                    help="device counts to evaluate (virtual/model modes)")
    ap.add_argument("--data", type=int, default=1, help="launch: data-axis size")
    ap.add_argument("--tile", type=int, default=0,
                    help="launch: tile-axis size (0 = all remaining devices)")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--gaussians", type=int, default=1_000_000)
    ap.add_argument("--shift", type=float, default=0.0,
                    help="scale shift of the bench scene (1.9 = real "
                         "MipNeRF-360 pair density at 5M gaussians)")
    ap.add_argument("--max-pairs", type=int, default=1 << 21)
    ap.add_argument("--steps", type=int, default=8, help="timed steps")
    ap.add_argument("--repeat", type=int, default=8,
                    help="model mode: in-jit repetitions per timed stage "
                         "(1 = plain per-dispatch timing minus the floor — "
                         "use for N-scale points whose stages dwarf the "
                         "dispatch floor; the R-wrapped graphs at 5M can "
                         "exceed the remote compile service's limits)")
    return ap.parse_args()


def _camera(width, height):
    from gsplat_tpu.ops.camera import CameraParams

    fx = 0.8 * width
    return CameraParams(
        width=width, height=height,
        fov_x=2 * math.atan(width / (2 * fx)), fov_y=2 * math.atan(height / (2 * fx)),
        focal_x=fx, focal_y=fx, qvec=(1.0, 0.0, 0.0, 0.0), tvec=(0.0, 0.0, 0.0),
    )


def virtual_mode(args):
    """Functional scaling check on virtual CPU devices."""
    import jax

    # The site config may pin jax_platforms to a TPU tunnel, overriding the
    # JAX_PLATFORMS env var — force the virtual CPU platform explicitly.
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gsplat_tpu import MeshConfig, RasterConfig, TrainConfig
    from gsplat_tpu.models.gaussians import random_model
    from gsplat_tpu.ops.camera import CameraArrays
    from gsplat_tpu.parallel.mesh import make_mesh
    from gsplat_tpu.parallel.shard import make_parallel_train_step

    width, height = 128, 96  # small: this mode checks structure, not speed
    cfg = RasterConfig(tile_size=16, chunk_size=8, pair_block=8, max_pairs=1 << 14,
                       use_pallas=False)
    model = random_model(jax.random.key(0), 2000)
    camera = _camera(width, height)
    target = jnp.zeros((height, width, 3), jnp.float32) + 0.3

    points = []
    ref_means = None
    for n in [int(x) for x in args.devices.split(",")]:
        if n > len(jax.devices()):
            continue
        tp = n  # pure tile sharding stresses the interesting axis
        mesh = make_mesh(MeshConfig(data=1, tile=tp))
        step, init_state, prep_targets = make_parallel_train_step(
            mesh, width, height, cfg, TrainConfig(ssim_weight=0.0)
        )
        cams = CameraArrays.stack([CameraArrays.from_params(camera)])
        tiles = prep_targets(jnp.stack([target]))
        m, _, metrics = step(model, init_state(model), cams, tiles)
        means = np.asarray(m.means)
        if ref_means is None:
            ref_means = means
            drift = 0.0
        else:
            drift = float(np.abs(means - ref_means).max())
            assert drift < 1e-4, f"grads not mesh invariant at tp={tp}: {drift}"
        points.append({"devices": n, "mesh": {"data": 1, "tile": tp},
                       "loss": float(metrics["loss"]),
                       "max_param_drift_vs_1dev": drift, "ok": True})
    return {"mode": "virtual", "points": points}


def model_mode(args):
    """Amdahl decomposition of the sharded step, measured on one real chip.

    Measures the REAL per-shard computation of ``parallel/shard._shard_bin``
    at each tile factor: sharded preprocess + feature pack + the
    gaussian-axis-sharded global histogram (N/tp work), then the replicated
    O(N) binning prologue and the per-shard P-scale binning WITH the fused
    sort-carried feature slab and the ``tile_count_override`` fast path —
    exactly the graph the sharded step runs, minus the collectives (noted
    in the output). Per-shard pair capacity is demand-sized at 1.5x like
    ``ParallelTrainer.check_capacity`` does."""
    import dataclasses as _dc

    from bench import _enable_compile_cache

    _enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from gsplat_tpu import RasterConfig
    from gsplat_tpu.ops import binning
    from gsplat_tpu.ops.camera import CameraArrays
    from gsplat_tpu.parallel.shard import _make_layout
    from gsplat_tpu.render.pipeline import preprocess_traced
    from gsplat_tpu.kernels.raster import rasterize_tiles, _backward_impl
    from timing import timed

    width, height = args.width, args.height
    cfg = RasterConfig(tile_size=32, chunk_size=32, max_pairs=args.max_pairs,
                       early_stop_transmittance=1e-4,
                       use_pallas=jax.default_backend() == "tpu")
    model = build_scene(args.gaussians, args.shift)
    cam = CameraArrays.from_params(_camera(width, height))
    n = args.gaussians

    # The tunneled backend adds a fixed dispatch+fetch latency to every
    # timed() call; measure it on a trivial program and subtract it from
    # each stage (it is NOT part of a fused multi-stage step).
    tiny = jnp.ones((8, 128), jnp.float32)
    floor, _ = timed(jax.jit(lambda x: x + 1.0), tiny)

    def net(t):
        return max(t - floor, 0.0)

    iters = args.steps
    R = max(int(args.repeat), 1)  # in-jit repetitions per timed stage
    eps = jnp.ones((R,), jnp.float32)

    def timed_rep(stage, out_sum):
        """Stage wall-time amortized over R in-jit repetitions.

        Small per-shard stages (2-20 ms at tp=8) drown in the ~27 ms
        tunnel dispatch floor when timed one dispatch per run. ``stage(e)``
        must consume the runtime scalar ``e`` (== 1.0 at runtime) so XLA
        cannot hoist the loop-invariant body out of the fori_loop, and
        ``out_sum`` maps its output to a scalar carried by the loop so
        nothing is dead-code-eliminated. One dispatch then covers R real
        executions and the floor amortizes away.
        """

        if R == 1:
            t, _ = timed(jax.jit(stage), jnp.float32(1.0), iters=iters)
            return max(t - floor, 0.0)

        @jax.jit
        def run(epsv):
            def body(i, acc):
                return acc + out_sum(stage(epsv[i]))

            return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

        t, _ = timed(run, eps, iters=3)
        return max((t - floor) / R, 0.0)

    points = []
    for tp in [int(x) for x in args.devices.split(",")]:
        lay = _make_layout(width, height, cfg.tile_size, tp)
        n_local = -(-n // tp)

        # Per-shard preprocess + pack + global-grid histogram of the
        # device's own N/tp gaussian slice (the sharded part of the
        # prologue; its [ny, nx] f32 output is psum'd over the mesh).
        sl = jax.tree.map(lambda x: x[:n_local], model)

        def prep_shard(m, c):
            p = preprocess_traced(m, c, width, height, cfg)
            rows = binning.pack_feature_rows(p)
            g_rects = binning.tile_ranges(
                p.cull_bbox, cfg.tile_size, lay.ntx_g, lay.nty_g
            )
            keep = p.active & (g_rects[2] > 0) & (g_rects[3] > 0)
            c2 = binning.coverage_histogram(
                g_rects, keep, lay.ntx_g, lay.nty_g
            )
            return p, rows, c2

        from gsplat_tpu.models.gaussians import GaussianModel as _GM

        def prep_stage(e):
            m2 = _GM(
                means=sl.means * e, log_scales=sl.log_scales, quats=sl.quats,
                opacity_logits=sl.opacity_logits, sh=sl.sh,
            )
            return prep_shard(m2, cam)

        t_prep = timed_rep(
            prep_stage,
            lambda out: jnp.sum(out[1]) + jnp.sum(out[2]) + jnp.sum(out[0].depth),
        )

        # Full-N arrays the all-gather would deliver.
        prep, feat_rows, counts2d_g = jax.jit(prep_shard)(model, cam)
        ox, oy = 0, 0
        c2 = jnp.pad(counts2d_g, (
            (0, lay.sy * lay.nty_l - lay.nty_g),
            (0, lay.sx * lay.ntx_l - lay.ntx_g),
        ))
        tile_count_o = (
            c2.reshape(lay.nty_l, lay.sy, lay.ntx_l, lay.sx)[:, oy, :, ox]
            .reshape(lay.tiles_local).astype(jnp.int32)
        )

        # Demand-size the per-shard capacity (ParallelTrainer auto_pairs).
        def demand_probe(p):
            rects = binning.strided_tile_ranges(
                p.cull_bbox, cfg.tile_size, lay.ntx_g, lay.nty_g,
                lay.sx, lay.sy, 0, 0,
            )
            cnt = jnp.where(p.active, rects[2] * rects[3], 0)
            return jnp.sum(cnt)

        demand = int(jax.jit(demand_probe)(prep))
        local_cap = max(int(demand * 1.5) // 128 * 128, 1 << 16)
        shard_cfg = _dc.replace(cfg, max_pairs=local_cap)

        # The real per-shard binning: strided rects, fused feature slab,
        # histogram override (exactly _shard_bin's bin_rects call).
        def bin_shard(p, rows, tco):
            rects = binning.strided_tile_ranges(
                p.cull_bbox, cfg.tile_size, lay.ntx_g, lay.nty_g,
                lay.sx, lay.sy, 0, 0,
            )
            return binning.bin_rects(
                p.depth, p.active, rects, lay.ntx_l, lay.nty_l,
                shard_cfg.max_pairs, align=shard_cfg.pair_block,
                feat_rows=jax.lax.stop_gradient(rows),
                tile_count_override=tco,
            )

        bins, pair_feat = jax.jit(bin_shard)(prep, feat_rows, tile_count_o)

        def bin_stage(e):
            return bin_shard(
                prep._replace(depth=prep.depth * e), feat_rows, tile_count_o
            )

        t_bin = timed_rep(
            bin_stage,
            lambda out: out[0].num_pairs.astype(jnp.float32)
            + jnp.sum(out[0].pair_gaussian.astype(jnp.float32))
            + jnp.sum(out[1]),
        )

        # Replicated-only part: the O(N) prologue (rects/counts/cumsum/
        # dkey + the windowed segment decode) — isolated by running the
        # same binning with every gaussian inactive: zero counts collapse
        # every P-scale stage to noise while keeping total <= cap, so the
        # same no-overflow fast path (and the override branch) is taken.
        def prologue_only(p, rows):
            rects = binning.strided_tile_ranges(
                p.cull_bbox, cfg.tile_size, lay.ntx_g, lay.nty_g,
                lay.sx, lay.sy, 0, 0,
            )
            return binning.bin_rects(
                p.depth, jnp.zeros_like(p.active), rects, lay.ntx_l,
                lay.nty_l, cfg.pair_block, align=cfg.pair_block,
                feat_rows=jax.lax.stop_gradient(rows),
                tile_count_override=jnp.zeros(
                    (lay.tiles_local,), jnp.int32
                ),
            )

        def prologue_stage(e):
            return prologue_only(prep._replace(depth=prep.depth * e), feat_rows)

        t_sort = timed_rep(
            prologue_stage,
            lambda out: out[0].pair_demand.astype(jnp.float32)
            + jnp.sum(out[0].tile_count.astype(jnp.float32))
            + jnp.sum(out[1]),
        )

        # Per-shard raster fwd+bwd over the local tiles, streaming the
        # fused slab (pair_feat) like the sharded step does.
        feat = jax.jit(binning.pack_features)(prep)
        li = np.arange(lay.tiles_local, dtype=np.int32)
        tile_ids = jnp.asarray(
            (li // lay.ntx_l * lay.sy) * lay.ntx_g + (li % lay.ntx_l) * lay.sx,
            jnp.int32,
        )
        pair_feat_i32 = jnp.asarray(
            jax.lax.bitcast_convert_type(pair_feat, jnp.int32)
        )

        def fwd_stage(e):
            # The kernel streams pair_feat_i32; an i32 add of (e-1 == 0)
            # makes each repetition depend on the loop index without
            # changing values.
            pf = pair_feat_i32 + (e.astype(jnp.int32) - 1)
            return rasterize_tiles(
                feat, bins.pair_gaussian, bins.tile_start, bins.tile_count,
                tile_ids, bins.gaussian_counts, lay.ntx_g, shard_cfg,
                pair_feat_i32=pf, width=width, height=height)

        t_fwd = timed_rep(
            fwd_stage, lambda out: jnp.sum(out[0]) + jnp.sum(out[1])
        )
        color, trans = jax.jit(lambda: fwd_stage(jnp.float32(1.0)))()

        g_c = jnp.ones_like(color) * 0.1
        g_t = jnp.zeros_like(trans)
        blocks_done = -(-bins.tile_count // cfg.pair_block)
        def bwd_stage(e):
            return _backward_impl(
                feat, bins.pair_gaussian, bins.tile_start, bins.tile_count,
                tile_ids, color * e, trans, g_c, g_t, blocks_done,
                bins.gaussian_counts, lay.ntx_g, shard_cfg)

        t_bwd = timed_rep(bwd_stage, lambda out: jnp.sum(out))

        # timed_rep values are already floor-netted per execution.
        num_pairs = int(bins.num_pairs)
        sort_net = t_sort
        t_bin_p = max(t_bin - t_sort, 0.0)  # P-scale part of binning
        print(f"# tp={tp} prologue={sort_net*1e3:.1f}ms prep={t_prep*1e3:.1f}ms "
              f"bin={t_bin_p*1e3:.1f}ms fwd={t_fwd*1e3:.1f}ms "
              f"bwd={t_bwd*1e3:.1f}ms pairs={num_pairs}",
              file=sys.stderr, flush=True)
        step = sort_net + t_prep + t_bin_p + t_fwd + t_bwd
        t1 = points[0]["proj_step_sec"] if points else step
        points.append({
            "devices": tp,
            "mesh": {"data": 1, "tile": tp},
            "replicated_prologue_sec": round(sort_net, 4),
            "shard_prep_sec": round(t_prep, 4),
            "shard_bin_sec": round(t_bin_p, 4),
            "shard_fwd_sec": round(t_fwd, 4),
            "shard_bwd_sec": round(t_bwd, 4),
            "proj_step_sec": round(step, 4),
            "local_pairs": num_pairs,
            "local_capacity": local_cap,
            "serial_fraction": round(sort_net / step, 4),
            "proj_pixels_per_sec": round(width * height / step / 1e6, 2),
            # T1 / (tp * T_tp): whole-frame speedup per chip count
            "proj_efficiency_vs_1": round(t1 / (tp * step), 4) if points else 1.0,
        })
    # Data-parallel scaling (batch of cameras over the `data` axis) is the
    # throughput axis: per-step cost is one full step plus one gradient
    # psum of the model (~n * 236 B), which ICI moves in a few ms — model
    # it so the report covers both mesh axes.
    t1 = points[0]["proj_step_sec"]
    psum_sec = n * 236 / 45e9  # one ring pass at ~45 GB/s/link
    dp_eff = t1 / (t1 + psum_sec)
    return {"mode": "model", "width": width, "height": height,
            "gaussians": n, "dispatch_floor_sec": round(floor, 4),
            "points": points,
            "data_parallel_efficiency_model": round(dp_eff, 4),
            "note": "tile-axis projection excludes the per-camera feature "
                    "all-gather (~N*88B over ICI at ~45GB/s/link: ~2ms at 1M "
                    "gaussians) and assumes balanced shards. For throughput "
                    "(frames/s) scaling, the data axis is the primary: "
                    "independent frames + one grad psum per step. Measure "
                    "real slices with --mode launch."}


def launch_mode(args):
    """Real multi-host run: jax.distributed from env, timed sharded step."""
    import jax

    from gsplat_tpu.parallel.mesh import initialize_distributed

    coord = os.environ.get("COORDINATOR_ADDRESS")
    nproc = os.environ.get("NUM_PROCESSES")
    pid = os.environ.get("PROCESS_ID")
    if coord and nproc:
        initialize_distributed(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid or 0),
        )

    import jax.numpy as jnp

    from bench import build_scene
    from gsplat_tpu import MeshConfig, RasterConfig, TrainConfig
    from gsplat_tpu.ops.camera import CameraArrays
    from gsplat_tpu.parallel.mesh import make_mesh
    from gsplat_tpu.parallel.shard import make_parallel_train_step

    ndev = len(jax.devices())
    tile = args.tile or (ndev // args.data)
    mesh = make_mesh(MeshConfig(data=args.data, tile=tile))
    width, height = args.width, args.height
    cfg = RasterConfig(tile_size=32, chunk_size=32, max_pairs=args.max_pairs,
                       early_stop_transmittance=1e-4,
                       use_pallas=jax.default_backend() == "tpu")
    model = build_scene(args.gaussians)
    step, init_state, prep_targets = make_parallel_train_step(
        mesh, width, height, cfg, TrainConfig(ssim_weight=0.2)
    )
    cams = CameraArrays.stack(
        [CameraArrays.from_params(_camera(width, height))] * args.data
    )
    tiles = prep_targets(
        jnp.zeros((args.data, height, width, 3), jnp.float32) + 0.25
    )
    opt_state = init_state(model)
    model, opt_state, metrics = step(model, opt_state, cams, tiles)  # compile
    float(metrics["loss"])
    start = time.perf_counter()
    for _ in range(args.steps):
        model, opt_state, metrics = step(model, opt_state, cams, tiles)
    float(metrics["loss"])
    sec = (time.perf_counter() - start) / args.steps
    return {
        "mode": "launch", "devices": ndev,
        "mesh": {"data": args.data, "tile": tile},
        "hosts": jax.process_count(),
        "sec_per_step": round(sec, 4),
        "frames_per_sec": round(args.data / sec, 3),
        "pixels_per_sec_per_chip": round(
            args.data * width * height / sec / ndev / 1e6, 2),
        "loss": float(metrics["loss"]),
    }


def main():
    args = _flags()
    if args.mode == "model":
        # Fail fast when the tunneled device wedges at the PJRT claim
        # (same guard as bench.py's _device_watchdog).
        import threading

        import numpy as np_

        done = threading.Event()

        def probe():
            import jax
            import jax.numpy as jnp

            x = jax.jit(lambda a: a + 1.0)(jnp.ones((8, 128), jnp.float32))
            np_.asarray(x.ravel()[:1])
            done.set()

        threading.Thread(target=probe, daemon=True).start()
        if not done.wait(300.0):
            print(json.dumps({"error": "device_unreachable"}), flush=True)
            os._exit(3)
    if args.mode == "virtual":
        out = virtual_mode(args)
    elif args.mode == "model":
        out = model_mode(args)
    else:
        out = launch_mode(args)
    import jax

    if jax.process_index() == 0:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
