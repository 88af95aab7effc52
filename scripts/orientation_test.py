"""Micro-bench: compositor chunk math in both VREG orientations.

A: pairs on sublanes [cs=32, npix=1024] (current kernels) — per-pair scalars
   broadcast across lanes, scan along sublanes.
B: pixels on sublanes [npix=1024, cs=128] — per-pair scalars broadcast across
   sublanes (native direction), scan along lanes, color accum on the MXU.

Both process the same number of pair-pixel products per grid step.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")
from timing import timed

NPIX = 1024
REPS_A = 8192  # chunks of 32 pairs
REPS_B = 2048  # chunks of 128 pairs (same total pairs)


def kernel_a(feat_ref, g_ref, out_ref, accum):
    # feat_ref: [32, 128] per-chunk features; g_ref [8, NPIX]
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, NPIX), 1)
    px = (lin % 32).astype(jnp.float32)
    py = (lin // 32).astype(jnp.float32)
    accum[...] = jnp.zeros((8, NPIX), jnp.float32)

    def body(c, _):
        feats = feat_ref[...] * (1.0 + 1e-6 * c)
        col = lambda i: feats[:, i][:, None]
        dx = col(0) - px
        dy = col(1) - py
        density = -0.5 * (col(2) * dx * dx + col(3) * dy * dy) - col(4) * dx * dy
        alpha = jnp.minimum(col(5) * jnp.exp(density), 0.99)
        inside = (px >= col(9)) & (px < col(11)) & (py >= col(10)) & (py < col(12))
        valid = (alpha > 1.0 / 255.0) & (density <= 0.0) & inside
        a = jnp.where(valid, alpha, 0.0)
        y = 1.0 - a
        s = 1
        while s < 32:
            pad = jnp.ones((s, NPIX), jnp.float32)
            y = y * jnp.concatenate([pad, y[:-s]], axis=0)
            s *= 2
        t_excl = jnp.concatenate([jnp.ones((1, NPIX), jnp.float32), y[:-1]], axis=0)
        w = a * t_excl * accum[3:4]
        for ch in range(3):
            rgb = feats[:, 6 + ch][:, None]
            accum[ch : ch + 1] = accum[ch : ch + 1] + jnp.sum(
                w * rgb, axis=0, keepdims=True
            )
        accum[3:4] = accum[3:4] * y[-1:]
        return ()

    jax.lax.fori_loop(0, REPS_A, body, ())
    out_ref[...] = accum[...]


def kernel_b(feat_ref, g_ref, out_ref, accum):
    # feat_ref: [16, 128] feature-major chunk (row i = feature i, lane k = pair)
    # accum: [NPIX, 128]: cols 0-2 color, col 3 transmittance
    sub = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 1), 0)
    px = (sub % 32).astype(jnp.float32)
    py = (sub // 32).astype(jnp.float32)
    accum[...] = jnp.zeros((NPIX, 128), jnp.float32)

    rgbt = jnp.zeros((128, 128), jnp.float32)

    def body(c, _):
        feats = feat_ref[...] * (1.0 + 1e-6 * c)
        row = lambda i: feats[i : i + 1, :]  # [1, 128]
        dx = row(0) - px
        dy = row(1) - py
        density = -0.5 * (row(2) * dx * dx + row(3) * dy * dy) - row(4) * dx * dy
        alpha = jnp.minimum(row(5) * jnp.exp(density), 0.99)
        inside = (px >= row(9)) & (px < row(11)) & (py >= row(10)) & (py < row(12))
        valid = (alpha > 1.0 / 255.0) & (density <= 0.0) & inside
        a = jnp.where(valid, alpha, 0.0)
        y = 1.0 - a  # [NPIX, 128]
        s = 1
        while s < 128:
            pad = jnp.ones((NPIX, s), jnp.float32)
            y = y * jnp.concatenate([pad, y[:, :-s]], axis=1)
            s *= 2
        t_excl = jnp.concatenate(
            [jnp.ones((NPIX, 1), jnp.float32), y[:, :-1]], axis=1
        )
        w = a * t_excl * accum[:, 3:4]
        # color accumulate on the MXU: [NPIX, 128] @ [128, 128]
        contrib = jax.lax.dot_general(
            w, rgbt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        accum[:, 0:3] = accum[:, 0:3] + contrib[:, 0:3]
        accum[:, 3:4] = accum[:, 3:4] * y[:, -1:]
        return ()

    jax.lax.fori_loop(0, REPS_B, body, ())
    out_ref[...] = accum[:, 0:8]


def run(kernel, feat_shape, out_shape, scratch_shape):
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(scratch_shape, jnp.float32)],
    )
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.uniform(0, 1, feat_shape).astype(np.float32))
    g = jnp.asarray(rng.uniform(0, 1, (8, NPIX)).astype(np.float32))
    return timed(jax.jit(lambda a, b: f(a, b)), feat, g, iters=10)


def main():
    pairs = REPS_A * 32
    t, _ = timed_a = run(kernel_a, (32, 128), (8, NPIX), (8, NPIX))
    print(f"A (pairs-on-sublanes): {t*1e3:7.2f} ms for {pairs} pairs x {NPIX} px "
          f"-> {t*1e9/(pairs*NPIX):.3f} ns/pair-px", flush=True)
    t, _ = run(kernel_b, (16, 128), (NPIX, 8), (NPIX, 128))
    print(f"B (pixels-on-sublanes): {t*1e3:7.2f} ms -> {t*1e9/(pairs*NPIX):.3f} ns/pair-px", flush=True)


if __name__ == "__main__":
    main()
