"""A/B the round-5 reduction + decode changes on the mid-density sweep point.

BENCH round-5 measured the 1.88-pairs/gaussian sweep point at 3.08 fps vs
round 3's 4.62 — this isolates which change regressed it: the windowed
segment decode (vs the classic scatter) and the 2-op reduction sort with
row-gathered columns (vs carrying 9 value operands).

Usage: python scripts/probe_regress.py [--shift 0.8] [--iters 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from unittest import mock

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shift", type=float, default=0.8)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from bench import (
        HEIGHT, WIDTH, _enable_compile_cache, bench_camera, build_scene,
        sized_capacity, time_fwd_bwd,
    )

    _enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from gsplat_tpu import RasterConfig
    from gsplat_tpu.ops import binning
    from gsplat_tpu.ops.camera import CameraArrays

    model = build_scene(1_000_000, args.shift)
    cam = CameraArrays.from_params(bench_camera())
    target = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32) + 0.25
    cap, dem = sized_capacity(model, cam)
    log(f"demand={dem} cap={cap}")
    cfg = RasterConfig(
        tile_size=32, chunk_size=32, max_pairs=cap,
        early_stop_transmittance=1e-4, strict_parity=True, use_pallas=True,
    )

    el, _ = time_fwd_bwd(model, cam, target, cfg, iters=args.iters)
    log(f"current (decode + 2-op reduction): {el*1e3:8.1f} ms = {1/el:.3f} fps")

    # A: force the classic scatter in place of the windowed decode.
    real_expand = binning.expand_segments

    def scatter_expand(counts, num_slots, cum=None, window=None, values=()):
        i32 = jnp.int32
        if cum is None:
            cum = jnp.cumsum(counts, dtype=i32)
        offsets = cum - counts
        n = counts.shape[0]
        iota_n = jax.lax.broadcasted_iota(i32, (n, 1), 0).squeeze(-1)
        starts = jnp.where(counts > 0, offsets, num_slots + iota_n)
        m = jnp.zeros((num_slots,), i32).at[starts].max(
            iota_n, mode="drop", unique_indices=True
        )
        gid = jax.lax.cummax(m)
        return (gid, offsets[gid], *(v.astype(i32)[gid] for v in values))

    jax.clear_caches()  # jit traces key on (code, closure) — force retrace
    with mock.patch.object(binning, "expand_segments", scatter_expand):
        el_a, _ = time_fwd_bwd(model, cam, target, cfg, iters=args.iters)
    log(f"A: scatter expand (round-4 style): {el_a*1e3:8.1f} ms = {1/el_a:.3f} fps")

    # B: carry the 9 gradient columns through the reduction sort (round-4
    # style) instead of the 2-op sort + row gather.
    from gsplat_tpu.kernels import raster_bwd as RB

    def sort_carry(ids, rows9):
        cols = [rows9[:, j] for j in range(9)]
        sorted_ops = jax.lax.sort((ids, *cols), num_keys=1, is_stable=False)
        cum9 = jnp.stack([jnp.cumsum(c) for c in sorted_ops[1:]], axis=1)
        return sorted_ops[0], cum9

    jax.clear_caches()
    with mock.patch.object(RB, "sorted_grad_cumsum", sort_carry):
        el_b, _ = time_fwd_bwd(model, cam, target, cfg, iters=args.iters)
    log(f"B: 10-op reduction sort (round-4 style): {el_b*1e3:8.1f} ms = {1/el_b:.3f} fps")


if __name__ == "__main__":
    main()
