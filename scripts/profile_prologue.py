"""Decompose the sortless binning prologue's O(N) cost on the current backend.

The tile-axis scaling measurement (SCALING_r04.json) shows the replicated
prologue at ~8.5 ms flat across device counts — 24% serial fraction at 8
devices (67% efficiency vs the >=80% target). This script times each O(N)
stage of ``bin_rects`` separately at the @8-shard shapes so the optimization
attacks the real constant, not a guess.

Usage:  python scripts/profile_prologue.py [N] [tp]
"""

from __future__ import annotations

import os
import sys

import jax

if os.environ.get("GSPLAT_CPU"):
    # The site config pins jax_platforms to the tunnel; the env var alone
    # is not enough (README §Operational notes).
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from timing import timed
from gsplat_tpu.ops import binning


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    tp = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    width, height, ts = 1920, 1080, 32
    ntx_g, nty_g = -(-width // ts), -(-height // ts)
    # Stride layout used by parallel/shard.py for tp devices.
    sx = 1
    while (tp // sx) * sx != tp or sx * sx < tp:
        sx += 1
    sy = tp // sx
    ntx_l, nty_l = -(-ntx_g // sx), -(-nty_g // sy)
    num_tiles = ntx_l * nty_l
    pair_block = 128
    # Local pair capacity at this shard count (mirrors multihost.py).
    local_cap = max((1 << 21) // tp, 1 << 16)
    local_cap -= local_cap % pair_block

    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.uniform(0.3, 10.0, n).astype(np.float32))
    active = jnp.asarray(rng.uniform(size=n) < 0.5)
    # Realistic headline footprints: ~2 tiles per active gaussian globally.
    cx = rng.uniform(0, width, n)
    cy = rng.uniform(0, height, n)
    r = rng.uniform(4, 40, n)
    bbox = np.stack(
        [np.clip(cx - r, 0, width), np.clip(cy - r, 0, height),
         np.clip(cx + r, 0, width), np.clip(cy + r, 0, height)], axis=1
    ).astype(np.int32)
    bbox = jnp.asarray(bbox)
    feat_rows = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))

    tiny = jnp.ones((8, 128), jnp.float32)
    floor, _ = timed(jax.jit(lambda x: x + 1.0), tiny)
    print(f"dispatch floor: {floor*1e3:7.2f} ms  (subtracted below)", flush=True)

    def report(name, t):
        print(f"{name:44s}{max(t - floor, 0.0)*1e3:8.2f} ms", flush=True)

    i32 = jnp.int32

    # -- stage 1: strided rects (elementwise O(N)) --------------------------
    def rects_fn(bb):
        return binning.strided_tile_ranges(bb, ts, ntx_g, nty_g, sx, sy, 0, 0)

    t, rects = timed(jax.jit(rects_fn), bbox)
    report("rects (strided_tile_ranges)", t)
    rects = tuple(jax.device_put(x) for x in rects)
    tx0, ty0, ntx, nty = rects

    # -- stage 2: counts + demand reduction + exclusive cumsum --------------
    def counts_fn(act, r):
        c = jnp.where(act, r[2] * r[3], 0).astype(i32)
        off = jnp.cumsum(c) - c
        return c, jnp.sum(c), off

    t, (counts, total, offsets) = timed(jax.jit(counts_fn), active, rects)
    report("counts + total + cumsum", t)
    print(f"  local pair demand: {int(total)} (cap {local_cap})", flush=True)

    # -- stage 3: segment-start marker scatter + cummax ---------------------
    def markers_fn(cnt, off):
        iota_n = jax.lax.broadcasted_iota(i32, (n, 1), 0).squeeze(-1)
        starts = jnp.where(cnt > 0, off, local_cap)
        m = jnp.zeros((local_cap,), i32).at[starts].max(iota_n, mode="drop")
        return jax.lax.cummax(m)

    t, pair_gid = timed(jax.jit(markers_fn), counts, offsets)
    report(f"marker scatter (N->{local_cap}) + cummax", t)

    # -- stage 4: wide [N,24] table build (bitcast feature columns) ---------
    def table_fn(off, cnt, r, d, f):
        bits = jax.lax.bitcast_convert_type(d, jnp.uint32)
        dkey = jnp.where(
            (bits & jnp.uint32(0x80000000)) != 0, ~bits,
            bits | jnp.uint32(0x80000000),
        )
        base = [off, cnt, r[0], r[1], r[2],
                jax.lax.bitcast_convert_type(dkey, i32)]
        fcols = jax.lax.bitcast_convert_type(f[:, :13], i32)
        return jnp.concatenate(
            [jnp.stack(base, axis=1), fcols, jnp.zeros((n, 5), i32)], axis=1
        )

    t, table = timed(jax.jit(table_fn), offsets, counts, rects, depth, feat_rows)
    report("wide [N,24] table build", t)

    def table8_fn(off, cnt, r, d):
        bits = jax.lax.bitcast_convert_type(d, jnp.uint32)
        dkey = jnp.where(
            (bits & jnp.uint32(0x80000000)) != 0, ~bits,
            bits | jnp.uint32(0x80000000),
        )
        base = [off, cnt, r[0], r[1], r[2],
                jax.lax.bitcast_convert_type(dkey, i32),
                jnp.zeros((n,), i32), jnp.zeros((n,), i32)]
        return jnp.stack(base, axis=1)

    t, _ = timed(jax.jit(table8_fn), offsets, counts, rects, depth)
    report("narrow [N,8] table build", t)

    # -- stage 5: P-scale row gather (for contrast; shrinks with tp) --------
    t, _ = timed(jax.jit(lambda tb, g: tb[g]), table, pair_gid)
    report(f"row gather [{local_cap},24] (P-scale)", t)

    # -- stage 6: MXU histogram ---------------------------------------------
    ntxp = -(-ntx_l // 128) * 128
    ntyp = -(-nty_l // 8) * 8

    def hist_fn(cnt, r):
        txc = jax.lax.broadcasted_iota(i32, (1, ntxp), 1)
        tyc = jax.lax.broadcasted_iota(i32, (1, ntyp), 1)
        keep = (cnt > 0)[:, None]
        xm = ((txc >= r[0][:, None]) & (txc < (r[0] + r[2])[:, None]) & keep
              ).astype(jnp.bfloat16)
        ym = ((tyc >= r[1][:, None]) & (tyc < (r[1] + r[3])[:, None]) & keep
              ).astype(jnp.bfloat16)
        c2 = jax.lax.dot_general(
            ym, xm, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return c2[:nty_l, :ntx_l].reshape(num_tiles).astype(i32)

    t, tile_count = timed(jax.jit(hist_fn), counts, rects)
    report(f"MXU histogram [{n},{ntyp}]x[{n},{ntxp}]", t)

    # -- whole prologue (zero-active trick from multihost.py) ---------------
    def prologue_only(d, bb):
        r = binning.strided_tile_ranges(bb, ts, ntx_g, nty_g, sx, sy, 0, 0)
        return binning.bin_rects(
            d, jnp.zeros((n,), bool), r, ntx_l, nty_l, pair_block,
            align=pair_block, feat_rows=feat_rows,
        )

    t, _ = timed(jax.jit(prologue_only), depth, bbox)
    report("whole prologue (zero-active bin_rects)", t)

    # -- whole local binning for contrast ------------------------------------
    def full_bin(d, act, bb, f):
        r = binning.strided_tile_ranges(bb, ts, ntx_g, nty_g, sx, sy, 0, 0)
        return binning.bin_rects(
            d, act, r, ntx_l, nty_l, local_cap, align=pair_block, feat_rows=f
        )

    t, _ = timed(jax.jit(full_bin), depth, active, bbox, feat_rows)
    report(f"whole local binning (cap {local_cap})", t)


if __name__ == "__main__":
    main()
