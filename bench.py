"""Headline benchmark: forward+backward render rate at 1080p on one chip.

Prints JSON lines of the form
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, "extra": {...}}
incrementally: the headline line is flushed the moment it is measured, and
each completed extra stage re-emits the enriched line — so the LAST line on
stdout is always the most complete valid artifact, on every exit path
(finish, budget-skip, external timeout kill). The whole default run keeps
itself inside GSPLAT_BENCH_BUDGET_S wall-clock seconds (default 780,
compiles included), skipping extras that don't fit; the real-density
point runs FIRST among the extras (it is the round's key claim).

Baseline (BASELINE.md): the torch reference renders one image in ~5 minutes
*forward-only* (README.md:5). We report full forward+backward (render +
loss + gradients to every splat parameter) frames/sec on one TPU chip;
``vs_baseline`` is the speedup over the reference's 1/300 fps.

The synthetic scene fills the frustum with 1M gaussians at 1920x1080. The
headline number uses the production config (early-stop transmittance 1e-4,
as the CUDA original does); ``extra`` additionally reports:
  * ``exact_mode_fps`` — the same step with early_stop=0.0 (exact
    reference semantics, the configuration every parity test runs);
  * ``pair_sweep`` — fps at increasing splat sizes (pairs/gaussian from
    ~1 up to ~10+, bracketing real MipNeRF-360 tile densities), each point
    sized to its measured pair demand.

Real-scene mode (needs a COLMAP scene + Inria checkpoint on disk):
  python bench.py --scene <dir> [--model <dir>] [--scale-factor k]
renders every camera of the scene (fwd+bwd against the GT image) and
reports fps + PSNR, with max_pairs auto-sized from the first view.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (default on; GSPLAT_NO_COMPILE_CACHE
    disables). The tunneled-TPU compiles dominate this bench's wall-clock
    (BENCH_r04: ~930 s spent, ~6 s of it measured steps), and the driver
    runs `python bench.py` on the same host the build self-runs on — a warm
    cache turns every repeat compile into a disk read."""
    if os.environ.get("GSPLAT_NO_COMPILE_CACHE"):
        return
    import jax

    # Scope the cache per backend: entries written by the tunneled-TPU
    # processes include host-side CPU AOT blobs compiled for the REMOTE
    # machine's CPU features — loading them in a local CPU run warns about
    # machine-feature mismatches (potential SIGILL).
    cache_root = os.environ.get(
        "GSPLAT_COMPILE_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    try:
        cache_dir = os.path.join(cache_root, jax.default_backend())
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass

WIDTH, HEIGHT = 1920, 1080
NUM_GAUSSIANS = 1_000_000
BASELINE_FPS = 1.0 / 300.0  # reference: ~5 min per forward-only frame

# Wall-clock budget for the WHOLE default run (compiles included). The
# driver runs ``python bench.py`` under its own timeout and tail-parses
# stdout for the last valid JSON line; round 3's run chained every extra
# stage before printing anything and timed out with zero artifact
# (BENCH_r03.json rc:124, parsed:null). The contract now: the headline JSON
# line is printed-and-flushed the moment it is measured, each completed
# extra stage re-emits an enriched line, and stages that don't fit the
# remaining budget are skipped (recorded in extra.budget.skipped) so the
# process exits 0 well inside the driver's window.
BENCH_BUDGET_S = float(os.environ.get("GSPLAT_BENCH_BUDGET_S", "780"))
_BENCH_T0 = [time.monotonic()]  # reset at synthetic_bench() entry, so
# in-process callers (tests import bench long before they run it) get a
# fresh budget per run; the device watchdog's probe time is excluded.


def _start_budget() -> None:
    _BENCH_T0[0] = time.monotonic()


def _time_left() -> float:
    return BENCH_BUDGET_S - (time.monotonic() - _BENCH_T0[0])


_EMITTED = [False]


def emit(result: dict) -> None:
    """Print one JSON line and flush — the driver tail-parses stdout, so
    every exit path after the first emit leaves a valid artifact."""
    _EMITTED[0] = True
    print(json.dumps(result), flush=True)


def _provisional_artifact_timer(metric: str, deadline_s: float) -> None:
    """Guarantee a parseable tail line even if a device op wedges AFTER the
    first-op watchdog passed (observed 2026-08-19: tunnel up at t=0, then a
    headline compile stretched past 10 min on a degraded link). If nothing
    has been emitted by ``deadline_s``, print a tagged zero-value line and
    KEEP RUNNING — a late real headline then prints after it and the
    driver's tail-parse picks the real one; a kill before that still finds
    this line instead of an empty log."""
    import threading

    def fire():
        if not _EMITTED[0]:
            print(json.dumps({
                "metric": metric,
                "value": 0.0,
                "unit": "frames/s",
                "vs_baseline": 0.0,
                "extra": {
                    "error": "no_headline_yet",
                    "detail": (
                        f"no measurement completed within {deadline_s:.0f}s "
                        "(tunnel slow or wedged mid-run); bench still "
                        "running — a later line supersedes this one"
                    ),
                },
            }), flush=True)

    t = threading.Timer(deadline_s, fire)
    t.daemon = True
    t.start()

# log-scale shifts for the pair-density sweep: each shift grows every splat
# by e^shift linearly, raising pairs/gaussian from ~1 toward real MipNeRF-360
# tile densities. Capacities are sized at runtime to 1.5x each point's
# measured pair demand (the auto_pairs headroom a real pipeline settles at);
# every P-scale stage pays linearly for slack, so no power-of-two rounding.
PAIR_SWEEP_SHIFTS = [0.0, 0.8, 1.4, 2.0]

# Real-MipNeRF-360-density config (round-2 VERDICT, missing #1): a garden/
# iteration_30000-sized workload — 5M gaussians at ~8 (tile, gaussian)
# pairs each, ~40M pairs at 1080p (the reference's own workload is a 5.8M-
# gaussian Inria checkpoint on such a scene, /root/reference/README.md:5).
REAL_DENSITY_N = 5_000_000
REAL_DENSITY_SHIFT = 1.9
# Depth-sliced production config at the real-density point
# (scripts/probe_sliced.py sweep, measured on the v5e 2026-08-19):
# slice 512K + reduce 1M -> 1.617 fps; slice 1M -> 1.533; slice 2M ->
# 1.283; reduce 4M is SLOWER (1.111 at slice 512K: the per-slice compact
# append pays O(r_blk) regardless of occupancy, render/sliced.py).
REAL_DENSITY_SLICE = 1 << 19
REAL_DENSITY_REDUCE = 1 << 20

# Secondary resolution point reported in ``extra`` (README §Performance).
RES_4K = (3840, 2160)

# Minimum pair capacity handed to the timed step (keeps tiny demand
# measurements from producing degenerate buffers; patchable in tests).
CAPACITY_FLOOR = 1 << 17

# Timed iterations per point (headline / sweep / real-density / 4K); the
# CPU smoke test patches these down to 1.
ITERS = (20, 8, 4, 6)


def build_scene(n: int, scale_shift: float = 0.0):
    """The bench scene, generated ON DEVICE (host->device over the tunneled
    TPU moves ~2 MB/s; the 5M-gaussian scene is 1.2 GB of parameters).
    Fills the view frustum: camera at origin looking down +z, z in [2, 10];
    base scale gives small splats (~1 pair each), ``scale_shift`` grows them.
    """
    import jax
    import jax.numpy as jnp

    from gsplat_tpu.models.gaussians import GaussianModel

    def gen(shift):
        ks = jax.random.split(jax.random.key(0), 6)
        z = jax.random.uniform(ks[0], (n,), minval=2.0, maxval=10.0)
        x = jax.random.uniform(ks[1], (n,), minval=-0.9, maxval=0.9) * z
        y = jax.random.uniform(ks[2], (n,), minval=-0.55, maxval=0.55) * z
        return GaussianModel(
            means=jnp.stack([x, y, z], -1),
            log_scales=jax.random.uniform(ks[3], (n, 3), minval=-5.2, maxval=-3.6)
            + shift,
            quats=jax.random.normal(ks[4], (n, 4)),
            opacity_logits=jax.random.uniform(ks[5], (n,), minval=-2.0, maxval=2.0),
            sh=jax.random.normal(jax.random.fold_in(ks[0], 1), (n, 48)).reshape(
                n, 16, 3
            )
            * 0.2,
        )

    return jax.jit(gen)(float(scale_shift))


def sized_capacity(
    model, cam, headroom: float = 1.5, width=None, height=None, tile_size=32
) -> tuple:
    """(capacity, demand): measured pair demand times ``headroom``,
    pair_block-aligned. width/height default to the module's (patchable)
    headline resolution at call time. Demand grows as ``tile_size`` shrinks
    (each splat covers more, smaller tiles), so the probe must match."""
    from gsplat_tpu import RasterConfig
    from gsplat_tpu.render.pipeline import binning_stats

    width = WIDTH if width is None else width
    height = HEIGHT if height is None else height
    probe = RasterConfig(tile_size=tile_size, chunk_size=32, max_pairs=1 << 20)
    demand = int(binning_stats(model, cam, width, height, probe)["pair_demand"])
    return max(int(demand * headroom) // 128 * 128, CAPACITY_FLOOR), demand


def bench_camera(width=None, height=None):
    from gsplat_tpu.ops.camera import CameraParams

    width = WIDTH if width is None else width
    height = HEIGHT if height is None else height
    fx = 0.8 * width
    return CameraParams(
        width=width, height=height,
        fov_x=2 * math.atan(width / (2 * fx)), fov_y=2 * math.atan(height / (2 * fx)),
        focal_x=fx, focal_y=fx,
        qvec=(1.0, 0.0, 0.0, 0.0), tvec=(0.0, 0.0, 0.0),
    )


def time_fwd_bwd(model, cam, target, cfg, iters=20):
    """Steady-state seconds per fwd+bwd step (render + loss + full grads).

    NOTE: on the tunneled TPU backend block_until_ready can return before
    execution finishes; the only reliable fence is a device->host fetch, so
    the timed window ends with float(loss) of the LAST iteration (all prior
    iterations are ordered before it on the single device stream).
    """
    import jax

    from gsplat_tpu.render.pipeline import render_traced
    from gsplat_tpu.train.loss import rgb_loss

    width, height = target.shape[1], target.shape[0]

    @jax.jit
    def fwd_bwd(m, cam, target):
        def loss_fn(m):
            image, _ = render_traced(m, cam, width, height, cfg)
            return rgb_loss(image, target, 0.2)

        return jax.value_and_grad(loss_fn)(m)

    loss, grads = fwd_bwd(model, cam, target)  # compile + warmup
    assert np.isfinite(float(loss)), loss
    start = time.perf_counter()
    for _ in range(iters):
        loss, grads = fwd_bwd(model, cam, target)
    final_loss = float(loss)
    elapsed = (time.perf_counter() - start) / iters
    return elapsed, final_loss


def pair_stats(model, cam, cfg):
    from gsplat_tpu.render.pipeline import binning_stats

    s = binning_stats(model, cam, WIDTH, HEIGHT, cfg)
    return int(s["num_pairs"]), int(s["pair_demand"]), bool(s["overflowed"])


def synthetic_bench(args):
    _start_budget()
    import jax
    import jax.numpy as jnp

    from gsplat_tpu import RasterConfig
    from gsplat_tpu.ops.camera import CameraArrays

    def make_cfg(max_pairs, early_stop, reduce_pairs=0, slice_pairs=0):
        return RasterConfig(
            tile_size=32, chunk_size=32, max_pairs=max_pairs,
            early_stop_transmittance=early_stop, strict_parity=True,
            use_pallas=jax.default_backend() == "tpu",
            reduce_pairs=reduce_pairs, slice_pairs=slice_pairs,
        )

    camera = bench_camera()
    cam = CameraArrays.from_params(camera)
    target = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32) + 0.25

    # Headline: base scene, EXACT reference semantics (early_stop=0 — the
    # configuration every parity test runs). At ~1 pair/gaussian the
    # early-stop while_loop's per-block condition costs more than the
    # compositing it skips, so exact mode is both stricter and faster;
    # the early-stop variant is reported in extra.
    model = build_scene(NUM_GAUSSIANS)
    max_pairs, num_pairs = sized_capacity(model, cam)
    # Capacity is sized at 1.5x the measured demand, so the step cannot
    # overflow and num_pairs == demand — re-probing with the headline cfg
    # (pair_stats) would only repeat the same binning compile on the
    # tunnel (~1 min of the driver's budget).
    assert num_pairs <= max_pairs, (num_pairs, max_pairs)
    cfg = make_cfg(max_pairs, 0.0)
    elapsed, final_loss = time_fwd_bwd(model, cam, target, cfg, iters=ITERS[0])
    fps = 1.0 / elapsed

    extra = {
        "mpixels_per_sec": round(fps * WIDTH * HEIGHT / 1e6, 2),
        "num_gaussians": NUM_GAUSSIANS,
        "max_pairs": max_pairs,
        "backend": jax.default_backend(),
        "sec_per_frame": round(elapsed, 4),
        "loss": final_loss,
        "pairs_per_gaussian": round(num_pairs / NUM_GAUSSIANS, 2),
    }
    result = {
        "metric": "1080p_fwd+bwd_frames_per_sec_per_chip",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 1),
        "extra": extra,
    }
    emit(result)  # the headline artifact exists from this point on
    if args.quick:
        return result

    budget = extra["budget"] = {"total_s": BENCH_BUDGET_S, "skipped": []}

    def fits(name: str, reserve_s: float) -> bool:
        """True if ``reserve_s`` of wall-clock remains for stage ``name``;
        otherwise records the skip (visible in the final artifact)."""
        if _time_left() < reserve_s:
            budget["skipped"].append(name)
            return False
        return True

    # Extras run in CLAIM-PRIORITY order, each gated on the remaining
    # wall-clock budget (reserves calibrated from the BENCH_r04 driver run:
    # on a cold compile cache the real-density point costs ~450 s including
    # its two tunnel compiles, the exact-mode variant ~130 s, each sweep
    # point ~70 s; with the persistent cache warm each costs seconds).
    # Real-MipNeRF-360-density point FIRST (5M gaussians, ~40M pairs — the
    # reference's own workload class and the round's key claim): tighter
    # 1.1x headroom (the scene is fixed and P-scale stages pay linearly for
    # slack), production early-stop mode, then exact reference semantics.
    if fits("real_density", 420.0):
        m = build_scene(REAL_DENSITY_N, REAL_DENSITY_SHIFT)
        try:
            cap, dem = sized_capacity(m, cam, headroom=1.1)
            # Production config at this density: depth-sliced lazy binning
            # (render/sliced.py) + early stop — P-scale sort work tracks
            # composited pairs, not total demand.
            c = make_cfg(cap, 1e-4, slice_pairs=REAL_DENSITY_SLICE,
                         reduce_pairs=REAL_DENSITY_REDUCE)
            el, _ = time_fwd_bwd(m, cam, target, c, iters=ITERS[2])
            extra["real_density"] = {
                "num_gaussians": REAL_DENSITY_N,
                "pair_demand": dem,
                "pairs_per_gaussian": round(dem / REAL_DENSITY_N, 2),
                "max_pairs": cap,
                "slice_pairs": REAL_DENSITY_SLICE,
                "fps": round(1.0 / el, 3),
                "sec_per_frame": round(el, 4),
            }
            emit(result)
            if fits("real_density.exact_mode", 150.0):
                el_exact, _ = time_fwd_bwd(
                    m, cam, target, make_cfg(cap, 0.0), iters=ITERS[2]
                )
                extra["real_density"]["exact_mode_fps"] = round(1.0 / el_exact, 3)
                emit(result)
            if fits("real_density.single_sort", 170.0):
                # The round-3 production config (single sort + compacted
                # reduction), for comparison.
                el_ss, _ = time_fwd_bwd(
                    m, cam, target, make_cfg(cap, 1e-4, reduce_pairs=cap // 4),
                    iters=ITERS[2],
                )
                extra["real_density"]["single_sort_fps"] = round(1.0 / el_ss, 3)
        except Exception as exc:
            extra["real_density"] = {"error": type(exc).__name__}
        del m
        emit(result)

    # 4K (3840x2160) point on the headline scene: per-pair fixed costs
    # amortize over more covered pixels, so Mpix/s improves with
    # resolution (README §Performance).
    if fits("res_4k", 110.0):
        try:
            w4, h4 = RES_4K
            cam4 = CameraArrays.from_params(bench_camera(w4, h4))
            t4 = jnp.zeros((h4, w4, 3), jnp.float32) + 0.25
            cap4, dem4 = sized_capacity(model, cam4, width=w4, height=h4)
            el4, _ = time_fwd_bwd(model, cam4, t4, make_cfg(cap4, 0.0), iters=ITERS[3])
            extra["res_4k"] = {
                "width": w4, "height": h4,
                "pair_demand": dem4,
                "fps": round(1.0 / el4, 3),
                "sec_per_frame": round(el4, 4),
                "mpixels_per_sec": round(w4 * h4 / el4 / 1e6, 2),
            }
        except Exception as exc:
            extra["res_4k"] = {"error": type(exc).__name__}
        emit(result)

    # Pair-density sweep: grow the splats, re-size the pair budget to
    # 1.5x each point's measured demand.
    sweep = extra["pair_sweep"] = []
    for shift in PAIR_SWEEP_SHIFTS:
        if not fits(f"pair_sweep[{shift}]", 80.0):
            continue
        m = model if shift == 0.0 else build_scene(NUM_GAUSSIANS, shift)
        try:
            cap, dem = sized_capacity(m, cam)
            c = make_cfg(cap, 1e-4)
            np_, dem, ovf = pair_stats(m, cam, c)
            el, _ = time_fwd_bwd(m, cam, target, c, iters=ITERS[1])
        except Exception as exc:  # e.g. HBM exhaustion at the heavy point
            sweep.append({"shift": shift, "error": type(exc).__name__})
            continue
        sweep.append(
            {
                "pairs_per_gaussian": round(np_ / NUM_GAUSSIANS, 2),
                "num_pairs": np_,
                "max_pairs": cap,
                "overflowed": ovf,
                "fps": round(1.0 / el, 3),
            }
        )
        emit(result)

    # The CUDA original's early-termination heuristic (T < 1e-4) on the
    # headline scene, for comparison; it only pays off at heavier pair
    # densities.
    if fits("early_stop", 70.0):
        el_es, _ = time_fwd_bwd(
            model, cam, target, make_cfg(max_pairs, 1e-4), iters=ITERS[0]
        )
        extra["early_stop_fps"] = round(1.0 / el_es, 3)

    budget["spent_s"] = round(time.monotonic() - _BENCH_T0[0], 1)
    return result


def scene_bench(args):
    """Real-scene mode: fwd+bwd over every camera of a COLMAP scene."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from gsplat_tpu import RasterConfig
    from gsplat_tpu.io.ply import load_splat_arrays
    from gsplat_tpu.io.scene import checkpoint_ply_path, read_scene
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.ops.camera import CameraArrays, CameraParams
    from gsplat_tpu.render.pipeline import render_traced, suggest_max_pairs
    from gsplat_tpu.train.loss import rgb_loss
    from gsplat_tpu.utils.progress import progress

    import os

    images, cameras = read_scene(args.scene)
    model_dir = args.model or args.scene
    model = GaussianModel.from_arrays(
        load_splat_arrays(checkpoint_ply_path(model_dir))
    )

    views = []
    for key in sorted(images):
        info = images[key]
        path = os.path.join(args.scene, f"images_{args.scale_factor}", info.name)
        if not os.path.exists(path):
            continue
        gt = np.asarray(Image.open(path), dtype=np.float32) / 255.0
        h, w = gt.shape[:2]
        cam = CameraParams.from_colmap(info, cameras[info.camera_id], w, h)
        views.append((cam, jnp.asarray(gt)))
    if not views:
        print(json.dumps({"error": f"no views found under {args.scene}"}))
        sys.exit(1)

    from functools import partial

    # Size the pair budget for the worst view (mixed camera resolutions are
    # possible in multi-camera COLMAP scenes; one compile per distinct size).
    probe = RasterConfig(
        tile_size=32, chunk_size=32, max_pairs=1 << 21,
        use_pallas=jax.default_backend() == "tpu",
    )
    max_pairs = max(
        suggest_max_pairs(model, c, probe, headroom=1.5) for c, _ in views
    )
    cfg = RasterConfig(
        tile_size=32, chunk_size=32, max_pairs=max_pairs,
        early_stop_transmittance=1e-4,
        use_pallas=jax.default_backend() == "tpu",
    )
    w, h = views[0][0].width, views[0][0].height

    @partial(jax.jit, static_argnames=("vw", "vh"))
    def fwd_bwd(m, cam, target, vw, vh):
        def loss_fn(m):
            image, _ = render_traced(m, cam, vw, vh, cfg)
            return rgb_loss(image, target, 0.2)

        return jax.value_and_grad(loss_fn)(m)

    @partial(jax.jit, static_argnames=("vw", "vh"))
    def psnr_of(m, cam, target, vw, vh):
        image, _ = render_traced(m, cam, vw, vh, cfg)
        mse = jnp.mean((image - target) ** 2)
        return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))

    # Warmup on view 0, then time every view back-to-back.
    cams = [CameraArrays.from_params(c, dtype=jnp.float32) for c, _ in views]
    sizes = [(c.width, c.height) for c, _ in views]
    loss, _ = fwd_bwd(model, cams[0], views[0][1], *sizes[0])
    float(loss)
    start = time.perf_counter()
    for cam, (_, gt), size in progress(
        list(zip(cams, views, sizes)), desc="bench views", enabled=not args.quick
    ):
        loss, _ = fwd_bwd(model, cam, gt, *size)
    float(loss)
    elapsed = (time.perf_counter() - start) / len(views)

    psnrs = [
        float(psnr_of(model, cam, gt, *size))
        for cam, (_, gt), size in zip(cams, views, sizes)
    ]
    fps = 1.0 / elapsed
    return {
        "metric": f"{h}p_real_scene_fwd+bwd_frames_per_sec_per_chip",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 1),
        "extra": {
            "scene": args.scene,
            "num_views": len(views),
            "width": w,
            "height": h,
            "num_gaussians": model.num_gaussians,
            "max_pairs": max_pairs,
            "mean_psnr": round(float(np.mean(psnrs)), 2),
            "backend": jax.default_backend(),
            "sec_per_frame": round(elapsed, 4),
        },
    }


def selftest(args):
    """On-chip production-shape kernel sanity check (round-3 verdict #7).

    Every Pallas-vs-jnp cross-check in tests/ runs at toy shapes (ts=16,
    chunk 8, pair_block 8) in interpreter mode; this renders ONE 1M-gaussian
    1080p view at the PRODUCTION config (ts=32, chunk 32, pair_block 128)
    with BOTH implementations on the real chip and asserts allclose —
    catching Mosaic/shape bugs the CPU tier structurally cannot.
    """
    import jax
    import jax.numpy as jnp

    from gsplat_tpu import RasterConfig
    from gsplat_tpu.ops.camera import CameraArrays
    from gsplat_tpu.render.pipeline import render_traced

    n = int(args.selftest_gaussians)
    model = build_scene(n)
    cam = CameraArrays.from_params(bench_camera())
    max_pairs, demand = sized_capacity(model, cam)

    def cfg(use_pallas):
        return RasterConfig(
            tile_size=32, chunk_size=32, pair_block=128,
            max_pairs=max_pairs, strict_parity=True,
            use_pallas=use_pallas, early_stop_transmittance=0.0,
        )

    img_p, trans_p = render_traced(model, cam, WIDTH, HEIGHT, cfg(True))
    img_j, trans_j = render_traced(model, cam, WIDTH, HEIGHT, cfg(False))
    err_img = float(jnp.max(jnp.abs(img_p - img_j)))
    err_trans = float(jnp.max(jnp.abs(trans_p - trans_j)))
    mean_img = float(jnp.mean(img_p))
    ok = bool(err_img < 1e-4 and err_trans < 1e-4 and np.isfinite(mean_img))
    return {
        "metric": "selftest_pallas_vs_jnp_max_abs_err",
        "value": err_img,
        "unit": "abs_err",
        "vs_baseline": 1.0 if ok else 0.0,
        "extra": {
            "ok": ok,
            "num_gaussians": n,
            "pair_demand": int(demand),
            "max_pairs": int(max_pairs),
            "config": "ts=32 chunk=32 pair_block=128 (production)",
            "max_abs_err_image": err_img,
            "max_abs_err_transmittance": err_trans,
            "mean_image": mean_img,
            "backend": jax.default_backend(),
        },
    }


def _device_watchdog(metric: str, timeout_s: float = 300.0):
    """Fail fast (with an honest JSON line) if the first device op never
    completes — the tunneled TPU backend can wedge at the PJRT client
    claim, hanging forever with ~0 CPU; without this the whole bench run
    produces no artifact at all. A probe that RAISES (fast init failure)
    exits immediately with the real error instead of burning the timeout."""
    import threading

    done = threading.Event()
    failure = []

    def probe():
        try:
            import jax
            import jax.numpy as jnp

            x = jax.jit(lambda a: a + 1.0)(jnp.ones((8, 128), jnp.float32))
            np.asarray(x.ravel()[:1])
        except BaseException as exc:  # noqa: BLE001 — reported, then exit
            failure.append(f"{type(exc).__name__}: {exc}")
        done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    timed_out = not done.wait(timeout_s)
    if timed_out or failure:
        detail = (
            f"first device op did not complete within {timeout_s:.0f}s "
            f"(TPU tunnel wedged/down)"
            if timed_out
            else f"device init failed: {failure[0]}"
        )
        print(json.dumps({
            "metric": metric,
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "extra": {"error": "device_unreachable", "detail": detail},
        }), flush=True)
        import os

        os._exit(3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=None, help="COLMAP scene dir (real-scene mode)")
    ap.add_argument("--model", default=None, help="Inria checkpoint dir (defaults to --scene)")
    ap.add_argument("--scale-factor", type=int, default=4)
    ap.add_argument(
        "--quick", action="store_true",
        help="headline number only (skip exact-mode + pair sweep)",
    )
    ap.add_argument(
        "--selftest", action="store_true",
        help="on-chip production-shape Pallas-vs-jnp allclose check",
    )
    ap.add_argument("--selftest-gaussians", type=int, default=1_000_000)
    args = ap.parse_args()

    metric = (
        "selftest_pallas_vs_jnp_max_abs_err" if args.selftest
        else "real_scene_fwd+bwd_frames_per_sec_per_chip" if args.scene
        else "1080p_fwd+bwd_frames_per_sec_per_chip"
    )
    _enable_compile_cache()
    _device_watchdog(metric)
    _provisional_artifact_timer(
        metric, float(os.environ.get("GSPLAT_BENCH_PROVISIONAL_S", "420"))
    )
    if args.selftest:
        result = selftest(args)
    elif args.scene:
        result = scene_bench(args)
    else:
        result = synthetic_bench(args)
    emit(result)
    if args.selftest and not result["extra"]["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
