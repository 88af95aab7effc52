"""Micro-benchmarks at real-density pair scale (P~41.6M): sort operand
scaling, fused-table row-gather widths, scatter-max boundary cost.

Not a test; a tuning tool for the binning/reduction stages at the
MipNeRF-360-density workload (bench.py REAL_DENSITY_*). Run on the chip:
    python scripts/micro_real_pairs.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))
import numpy as np, jax, jax.numpy as jnp
from timing import timed

T0 = time.time()
def log(m): print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)

P = 41_602_944
N = 5_000_000

key = jax.random.key(0)
tile = jax.random.randint(key, (P,), 0, 2040, jnp.int32)
dkey = jax.random.bits(jax.random.fold_in(key, 1), (P,), jnp.uint32)
vals = jnp.arange(P, dtype=jnp.int32)
fcol = jnp.zeros((P,), jnp.float32)

# 2-key sorts with growing payload (fused binning carries 13 f32 + ids)
for npay in [1, 7, 14]:
    ops = (tile, dkey, vals) + tuple(fcol for _ in range(npay - 1))
    t, _ = timed(jax.jit(lambda *o: jax.lax.sort(o, num_keys=2, is_stable=True)), *ops, warmup=1, iters=3)
    log(f"stable 2-key sort +{npay} payload at {P}: {t*1e3:.0f} ms")

# 1-key unstable sort with 9 payloads (the reduction)
t, _ = timed(jax.jit(lambda *o: jax.lax.sort(o, num_keys=1, is_stable=False)),
             vals, *[fcol]*9, warmup=1, iters=3)
log(f"unstable 1-key sort +9 payload at {P}: {t*1e3:.0f} ms")
# ... at compact scale P/8
Pc = P // 8
t, _ = timed(jax.jit(lambda *o: jax.lax.sort(o, num_keys=1, is_stable=False)),
             vals[:Pc], *[fcol[:Pc]]*9, warmup=1, iters=3)
log(f"unstable 1-key sort +9 payload at {Pc}: {t*1e3:.0f} ms")

# flat cumsum at P (x9 in the full reduction)
t, _ = timed(jax.jit(lambda x: jnp.cumsum(x)), fcol, warmup=1, iters=3)
log(f"flat f32 cumsum at {P}: {t*1e3:.0f} ms")

# row-gather widths (fused table): monotone-ish indices
gid = jnp.sort(jax.random.randint(jax.random.fold_in(key, 2), (P,), 0, N, jnp.int32))
for w in [8, 24, 32]:
    tb = jnp.zeros((N, w), jnp.int32)
    t, _ = timed(jax.jit(lambda tb, g: tb[g]), tb, gid, warmup=1, iters=3)
    log(f"table row-gather [P,{w}] i32: {t*1e3:.0f} ms ({t/P*1e9:.1f} ns/row)")

# block-level gather (compacted reduction): [cap_blk] rows of [16,128]
nblk = P // 128
cap_blk = nblk // 8
src = jax.random.randint(jax.random.fold_in(key, 3), (cap_blk,), 0, nblk, jnp.int32)
blocks = jnp.zeros((nblk, 16, 128), jnp.float32)
t, _ = timed(jax.jit(lambda b, s: b[s]), blocks, src, warmup=1, iters=3)
log(f"block gather [{cap_blk}] x 8KB: {t*1e3:.0f} ms")

# scatter-max boundaries at compact scale
ids_c = jnp.sort(jax.random.randint(jax.random.fold_in(key, 4), (Pc,), 0, N, jnp.int32))
def lastpos(ids):
    return jnp.full((N + 1,), -1, jnp.int32).at[ids].max(jnp.arange(Pc, dtype=jnp.int32), mode="drop")
t, _ = timed(jax.jit(lastpos), ids_c, warmup=1, iters=3)
log(f"scatter-max lastpos at {Pc}: {t*1e3:.0f} ms")

# [N,9]-row gather x2 (boundary gathers)
cum9 = jnp.zeros((Pc, 9), jnp.float32)
at = jnp.sort(jax.random.randint(jax.random.fold_in(key, 5), (N + 1,), 0, Pc, jnp.int32))
t, _ = timed(jax.jit(lambda c, a: c[a]), cum9, at, warmup=1, iters=3)
log(f"[N,9] row gather from [Pc,9]: {t*1e3:.0f} ms")

# elementwise P-pass (the where/mask cost unit)
t, _ = timed(jax.jit(lambda x: jnp.where(x > 0, x, 0.0) + 1.0), fcol, warmup=1, iters=3)
log(f"one elementwise P pass: {t*1e3:.0f} ms")
