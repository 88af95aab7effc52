"""Pallas TPU forward rasterization kernel.

One grid step per 32x32-pixel tile (= 1024 pixels = eight (8,128) f32 VPU
tiles — the TPU-native replacement for the reference's 16x16 CUDA block and
its sequential per-gaussian loop, rasterize.py:436-452). Per tile:

  * ``tile_start``/``tile_count`` arrive as scalar-prefetch arguments,
  * the tile's depth-ordered pair-feature slab lives in HBM and is streamed
    in ``chunk_size``-row chunks with double-buffered async DMA,
  * each chunk's alphas are evaluated for all pixels at once [chunk, npix],
    the front-to-back recurrence becomes an exclusive cumprod of (1-alpha)
    along the chunk axis (Hillis-Steele doubling — kernels/scans.py), and
    color is accumulated with exact-f32 VPU sublane reductions (the MXU is
    deliberately avoided here: its bf16 input rounding would break image
    parity with the f32 reference),
  * optional early termination once every pixel's transmittance is below
    ``cfg.early_stop_transmittance`` (the CUDA original's T<1e-4 trick; the
    torch reference has no equivalent, so parity runs use 0.0).

Binning must be chunk-aligned (ops/binning.py ``align=chunk_size``): sentinel
pairs point at the zero feature row whose empty bbox yields alpha == 0, so no
per-lane masking is needed anywhere.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsplat_tpu.config import MAX_GAUSSIAN_DENSITY, MIN_ALPHA, RasterConfig
from gsplat_tpu.kernels.scans import cumprod_inclusive, exclusive_from_inclusive
from gsplat_tpu.ops import binning as B


def _chunk_alpha(feats, px, py):
    """Effective alpha for one chunk: [chunk, 16] features x [1, npix]
    pixel coords -> [chunk, npix]. Math per rasterize.py:279-292 + bbox
    containment (rasterize.py:271-275)."""
    col = lambda i: feats[:, i][:, None]
    dx = col(B.FEAT_MEAN_X) - px
    dy = col(B.FEAT_MEAN_Y) - py
    density = (
        -0.5 * (col(B.FEAT_CONIC_X) * dx * dx + col(B.FEAT_CONIC_Y) * dy * dy)
        - col(B.FEAT_CONIC_XY) * dx * dy
    )
    alpha = jnp.minimum(col(B.FEAT_OPACITY) * jnp.exp(density), MAX_GAUSSIAN_DENSITY)
    inside = (
        (px >= col(B.FEAT_X_MIN))
        & (px < col(B.FEAT_X_MAX))
        & (py >= col(B.FEAT_Y_MIN))
        & (py < col(B.FEAT_Y_MAX))
    )
    valid = (alpha > MIN_ALPHA) & (density <= 0.0) & inside
    return jnp.where(valid, alpha, 0.0)


def _fwd_kernel(
    # scalar prefetch
    tile_start_ref,
    tile_count_ref,
    tile_ids_ref,
    # inputs
    feat_hbm,
    # outputs
    out_ref,
    # scratch
    slab,
    sems,
    accum,
    *,
    n_tiles_x: int,
    tile_size: int,
    chunk_size: int,
    early_stop: float,
):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    tid = tile_ids_ref[t]  # global tile index (differs from t under sharding)
    cs = chunk_size
    npix = tile_size * tile_size
    nchunks = (count + cs - 1) // cs

    tx = tid % n_tiles_x
    ty = tid // n_tiles_x
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
    px = (tx * tile_size + lin % tile_size).astype(jnp.float32)
    py = (ty * tile_size + lin // tile_size).astype(jnp.float32)

    accum[0:3] = jnp.zeros((3, npix), jnp.float32)
    accum[3:8] = jnp.zeros((5, npix), jnp.float32)
    accum[3:4] = jnp.ones((1, npix), jnp.float32)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            feat_hbm.at[pl.ds(start + c * cs, cs)], slab.at[slot], sems.at[slot]
        )

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def process_chunk(c):
        """Composite one chunk; returns the updated transmittance row."""
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            get_dma(1 - slot, c + 1).start()

        get_dma(slot, c).wait()
        feats = slab[slot]  # [cs, 16]

        a = _chunk_alpha(feats, px, py)  # [cs, npix]
        cum = cumprod_inclusive(1.0 - a)
        t_excl = exclusive_from_inclusive(cum, 1.0)
        trans = accum[3:4]  # [1, npix]
        w = a * t_excl * trans
        # Color reduction on the MXU: rgb^T [3, cs] @ w [cs, npix] in one
        # HIGHEST-precision (f32-exact products, f32 accumulate) matmul —
        # cross-sublane VPU reductions would cost ~2 VREG-ops per row.
        contrib = jax.lax.dot_general(
            feats[:, B.FEAT_R : B.FEAT_B + 1], w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [3, npix]
        accum[0:3] = accum[0:3] + contrib
        new_trans = trans * cum[-1:]
        accum[3:4] = new_trans
        return new_trans

    if early_stop > 0.0:

        def cond(state):
            c, stop = state
            return (c < nchunks) & jnp.logical_not(stop)

        def body(state):
            c, _ = state
            new_trans = process_chunk(c)
            return c + 1, jnp.max(new_trans) < early_stop

        chunks_done, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros((), jnp.bool_))
        )

        # On early exit the prefetch for chunk `chunks_done` is still in
        # flight; drain it so its DMA/semaphore cannot race the next grid
        # step's copies into the same slot.
        @pl.when((chunks_done > 0) & (chunks_done < nchunks))
        def _():
            get_dma(jax.lax.rem(chunks_done, 2), chunks_done).wait()
    else:

        def body(c, _):
            process_chunk(c)
            return ()

        jax.lax.fori_loop(0, nchunks, body, ())
        chunks_done = nchunks
    # Row 4 records how many chunks this tile composited before the
    # transmittance collapsed; the backward kernel walks only those (the
    # skipped tail contributed nothing, so its gradient is exactly zero).
    accum[4:5] = jnp.full((1, npix), chunks_done.astype(jnp.float32))
    out_ref[0] = accum[:]


def build_pair_feat(
    feat: jnp.ndarray, pair_gaussian: jnp.ndarray, chunk_size: int
) -> jnp.ndarray:
    """Gather per-pair features for the kernels' chunked DMA: one XLA row
    gather, plus one chunk of zero rows so the last DMA of the last tile
    never reads out of bounds, and a 16 -> 128 lane pad (TPU DMA slices
    must be 128-lane aligned). The result is shared between the forward and
    backward kernels (the gather is ~half a kernel's cost at 2M pairs)."""
    pair_feat = jnp.concatenate(
        [feat[pair_gaussian], jnp.zeros((chunk_size, feat.shape[-1]), feat.dtype)],
        axis=0,
    )
    return jnp.pad(pair_feat, ((0, 0), (0, 128 - B.NUM_FEATURES)))


@functools.partial(jax.jit, static_argnames=("n_tiles_x", "cfg", "interpret"))
def forward_tiles_pallas(
    feat: jnp.ndarray,
    pair_gaussian: jnp.ndarray,
    tile_start: jnp.ndarray,
    tile_count: jnp.ndarray,
    tile_ids: jnp.ndarray,
    n_tiles_x: int,
    cfg: RasterConfig,
    interpret: bool = False,
    pair_feat: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rasterize the given tiles with the Pallas kernel.

    Returns (color [T, npix, 3], transmittance [T, npix], chunks_done [T]
    int32 — chunks composited per tile before early termination; equals
    ceil(count/chunk) when ``cfg.early_stop_transmittance == 0``).
    """
    ts = cfg.tile_size
    cs = cfg.chunk_size
    npix = ts * ts
    num_tiles = tile_ids.shape[0]

    if pair_feat is None:
        pair_feat = build_pair_feat(feat, pair_gaussian, cs)

    kernel = functools.partial(
        _fwd_kernel,
        n_tiles_x=n_tiles_x,
        tile_size=ts,
        chunk_size=cs,
        early_stop=cfg.early_stop_transmittance,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 8, npix), lambda t, s, c, i: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, cs, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((8, npix), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, npix), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(pair_gaussian.shape[0]) * npix * 20,
            bytes_accessed=int(pair_gaussian.shape[0]) * 64 + num_tiles * npix * 16,
            transcendentals=int(pair_gaussian.shape[0]) * npix,
        ),
    )(tile_start, tile_count, tile_ids, pair_feat)

    color = jnp.moveaxis(out[:, 0:3, :], 1, 2)  # [T, npix, 3]
    trans = out[:, 3, :]  # [T, npix]
    chunks_done = out[:, 4, 0].astype(jnp.int32)  # [T]
    return color.astype(feat.dtype), trans.astype(feat.dtype), chunks_done
