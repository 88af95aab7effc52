"""Prologue deep-dive: scatter variants + cumulative prefixes of bin_rects.

profile_prologue.py isolated the marker scatter (~3.9 ms of the ~9.2 ms
replicated prologue) but left ~4.4 ms unaccounted (isolated-stage sums
don't match the whole graph under fusion). This script (a) prices
alternative formulations of the monotone segment-start scatter, and
(b) times cumulative prefixes of the real prologue graph so stage costs
come out as differences under the SAME fusion regime.

Usage:  python scripts/profile_prologue2.py [N]
"""

from __future__ import annotations

import os
import sys

import jax

if os.environ.get("GSPLAT_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from timing import timed
from gsplat_tpu.ops import binning

I32 = jnp.int32
U32 = jnp.uint32


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    width, height, ts = 1920, 1080, 32
    ntx_g, nty_g = -(-width // ts), -(-height // ts)
    sx, sy = 4, 2  # tp=8 layout
    ntx_l, nty_l = -(-ntx_g // sx), -(-nty_g // sy)
    num_tiles = ntx_l * nty_l
    align = 128
    cap = 262144

    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.uniform(0.3, 10.0, n).astype(np.float32))
    counts_np = np.where(rng.uniform(size=n) < 0.3,
                         rng.integers(1, 4, n), 0).astype(np.int32)
    counts = jnp.asarray(counts_np)
    offsets_np = np.cumsum(counts_np) - counts_np
    offsets = jnp.asarray(offsets_np.astype(np.int32))
    feat_rows = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    cx = rng.uniform(0, width, n)
    cy = rng.uniform(0, height, n)
    r = rng.uniform(4, 40, n)
    bbox = jnp.asarray(np.stack(
        [np.clip(cx - r, 0, width), np.clip(cy - r, 0, height),
         np.clip(cx + r, 0, width), np.clip(cy + r, 0, height)], axis=1
    ).astype(np.int32))

    tiny = jnp.ones((8, 128), jnp.float32)
    floor, _ = timed(jax.jit(lambda x: x + 1.0), tiny)
    print(f"dispatch floor: {floor*1e3:7.2f} ms", flush=True)

    def report(name, t):
        print(f"{name:52s}{max(t - floor, 0.0)*1e3:8.2f} ms", flush=True)

    iota_n = jnp.arange(n, dtype=I32)

    # ---- scatter variants --------------------------------------------------
    def v_base(cnt, off):
        starts = jnp.where(cnt > 0, off, cap)
        m = jnp.zeros((cap,), I32).at[starts].max(iota_n, mode="drop")
        return jax.lax.cummax(m)

    t, ref = timed(jax.jit(v_base), counts, offsets)
    report("scatter-max + cummax (baseline)", t)

    def v_unique(cnt, off):
        starts = jnp.where(cnt > 0, off, cap + iota_n)  # keep OOB unique too
        m = jnp.zeros((cap,), I32).at[starts].max(
            iota_n, mode="drop", unique_indices=True
        )
        return jax.lax.cummax(m)

    t, out = timed(jax.jit(v_unique), counts, offsets)
    ok = bool(jnp.array_equal(out, ref))
    report(f"scatter-max unique_indices (match={ok})", t)

    def v_scatter_only(cnt, off):
        starts = jnp.where(cnt > 0, off, cap)
        return jnp.zeros((cap,), I32).at[starts].max(iota_n, mode="drop")

    t, _ = timed(jax.jit(v_scatter_only), counts, offsets)
    report("scatter-max only (no cummax)", t)

    def v_cummax_only(m):
        return jax.lax.cummax(m)

    m0 = jax.jit(v_scatter_only)(counts, offsets)
    t, _ = timed(jax.jit(v_cummax_only), m0)
    report(f"cummax only ([{cap}])", t)

    def v_add_rank(cnt, off):
        # rank[slot] = #segment-starts <= slot; pair_gid needs the OWNING id,
        # which for compacted ranks requires a kept-id gather — price the
        # rank machinery alone first.
        starts = jnp.where(cnt > 0, off, cap)
        h = jnp.zeros((cap,), I32).at[starts].add(1, mode="drop")
        return jnp.cumsum(h)

    t, _ = timed(jax.jit(v_add_rank), counts, offsets)
    report("scatter-add ones + cumsum (rank)", t)

    def v_sort(cnt, off):
        starts = jnp.where(cnt > 0, off, jnp.int32(2**30))
        s, v = jax.lax.sort((starts, iota_n), num_keys=1, is_stable=True)
        return s[0] + v[0]

    t, _ = timed(jax.jit(v_sort), counts, offsets)
    report("lax.sort (starts, iota) 1M 2-op (alt price)", t)

    # ---- cumulative prefixes of the real prologue ---------------------------
    active0 = jnp.zeros((n,), bool)

    def pfx_rects(bb):
        r = binning.strided_tile_ranges(bb, ts, ntx_g, nty_g, sx, sy, 0, 0)
        return r[0].sum() + r[1].sum() + r[2].sum() + r[3].sum()

    t, _ = timed(jax.jit(pfx_rects), bbox)
    report("prefix A: rects", t)

    def _common(bb, act, d):
        tx0, ty0, ntx, nty = binning.strided_tile_ranges(
            bb, ts, ntx_g, nty_g, sx, sy, 0, 0)
        cnt = jnp.where(act, ntx * nty, 0).astype(I32)
        off = jnp.cumsum(cnt) - cnt
        bits = jax.lax.bitcast_convert_type(d, U32)
        dkey = jnp.where((bits & U32(0x80000000)) != 0, ~bits,
                         bits | U32(0x80000000))
        return tx0, ty0, ntx, nty, cnt, off, dkey

    mp = align  # prologue-scale pair capacity

    def pfx_counts(bb, act, d):
        *_, cnt, off, dkey = _common(bb, act, d)
        return cnt.sum() + off[-1] + dkey.sum().astype(I32)

    t, _ = timed(jax.jit(pfx_counts), bbox, active0, depth)
    report("prefix B: + counts/cumsum/dkey", t)

    def pfx_scatter(bb, act, d):
        *_, cnt, off, dkey = _common(bb, act, d)
        starts = jnp.where(cnt > 0, off, mp)
        m = jnp.zeros((mp,), I32).at[starts].max(iota_n, mode="drop")
        return jax.lax.cummax(m).sum()

    t, _ = timed(jax.jit(pfx_scatter), bbox, active0, depth)
    report("prefix C: + marker scatter+cummax (cap=128)", t)

    def pfx_table(bb, act, d, f):
        tx0, ty0, ntx, nty, cnt, off, dkey = _common(bb, act, d)
        starts = jnp.where(cnt > 0, off, mp)
        m = jnp.zeros((mp,), I32).at[starts].max(iota_n, mode="drop")
        gid = jax.lax.cummax(m)
        base = [off, cnt, tx0, ty0, ntx,
                jax.lax.bitcast_convert_type(dkey, I32)]
        fcols = jax.lax.bitcast_convert_type(f[:, :13], I32)
        table = jnp.concatenate(
            [jnp.stack(base, axis=1), fcols, jnp.zeros((n, 5), I32)], axis=1)
        return table[gid].sum()

    t, _ = timed(jax.jit(pfx_table), bbox, active0, depth, feat_rows)
    report("prefix D: + wide table + row gather", t)

    def pfx_hist(bb, act, d, f):
        tx0, ty0, ntx, nty, cnt, off, dkey = _common(bb, act, d)
        ntxp = -(-ntx_l // 128) * 128
        ntyp = -(-nty_l // 8) * 8
        txc = jax.lax.broadcasted_iota(I32, (1, ntxp), 1)
        tyc = jax.lax.broadcasted_iota(I32, (1, ntyp), 1)
        keep = (cnt > 0)[:, None]
        xm = ((txc >= tx0[:, None]) & (txc < (tx0 + ntx)[:, None]) & keep
              ).astype(jnp.bfloat16)
        ym = ((tyc >= ty0[:, None]) & (tyc < (ty0 + nty)[:, None]) & keep
              ).astype(jnp.bfloat16)
        c2 = jax.lax.dot_general(
            ym, xm, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return pfx_table(bb, act, d, f) + c2.sum().astype(I32)

    t, _ = timed(jax.jit(pfx_hist), bbox, active0, depth, feat_rows)
    report("prefix E: + MXU histogram", t)

    def pfx_full(bb, act, d, f):
        r = binning.strided_tile_ranges(bb, ts, ntx_g, nty_g, sx, sy, 0, 0)
        out = binning.bin_rects(d, act, r, ntx_l, nty_l, mp, align=align,
                                feat_rows=f)
        tb, pf = out
        return tb.pair_gaussian.sum() + pf.sum().astype(jnp.float32)

    t, _ = timed(jax.jit(pfx_full), bbox, active0, depth, feat_rows)
    report("prefix F: full bin_rects (prologue scale)", t)


if __name__ == "__main__":
    main()
