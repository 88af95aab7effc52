"""Pallas TPU forward rasterization kernel.

One grid step per 32x32-pixel tile (= 1024 pixels = eight (8,128) f32 VPU
tiles — the TPU-native replacement for the reference's 16x16 CUDA block and
its sequential per-gaussian loop, rasterize.py:436-452). Per tile:

  * ``tile_start``/``tile_count`` arrive as scalar-prefetch arguments,
  * the tile's depth-ordered pair features live in HBM as DENSE column-major
    blocks ``[nblk, 16, pair_block]`` (feature f of local pair j at
    ``[b, f, j]``) and are streamed block-by-block with double-buffered
    async DMA. The column-major block layout stores 64 B/pair — a row-major
    ``[P, 16]`` slab would be lane-padded to ``[P, 128]`` by the (8, 128)
    TPU tiling, an 8x HBM/DMA tax on the kernels' hottest stream,
  * each DMA'd block is transposed in-VMEM to ``[pair_block, 16]`` (Mosaic
    lowers the 2D transpose natively, bitwise exact) and composited in
    ``chunk_size``-pair sub-chunks: a sub-chunk's alphas are evaluated for
    all pixels at once [chunk, npix], the front-to-back recurrence becomes
    an exclusive cumprod of (1-alpha) along the chunk axis (Hillis-Steele
    doubling — kernels/scans.py), and color is accumulated with an MXU
    matmul at HIGHEST precision (f32-exact),
  * optional early termination once every pixel's transmittance is below
    ``cfg.early_stop_transmittance``, checked once per *block* (the CUDA
    original's T<1e-4 trick, amortized; the torch reference has no
    equivalent, so parity runs use 0.0).

Binning must be block-aligned (ops/binning.py ``align=cfg.pair_block``):
sentinel pairs point at the zero feature row whose empty bbox yields
alpha == 0, so no per-lane masking is needed anywhere.
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
    """Effective alpha for one sub-chunk: [chunk, 16] features x [1, npix]
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
    feat_hbm,  # [nblk, 16, pair_block] dense feature blocks
    # (with_carry) init_ref: [1, 8, npix] — carry-in accumulator state
    *refs,
    n_tiles_x: int,
    tile_size: int,
    chunk_size: int,
    pair_block: int,
    early_stop: float,
    with_carry: bool = False,
    width: int = 0,
    height: int = 0,
):
    if with_carry:
        init_ref, out_ref, slab, sems, accum = refs
    else:
        out_ref, slab, sems, accum = refs
    t = pl.program_id(0)
    start = tile_start_ref[t]  # in pairs; a multiple of pair_block
    count = tile_count_ref[t]
    tid = tile_ids_ref[t]  # global tile index (differs from t under sharding)
    cs = chunk_size
    blk = pair_block
    npix = tile_size * tile_size
    blk0 = start // blk
    nblocks = (count + blk - 1) // blk

    tx = tid % n_tiles_x
    ty = tid // n_tiles_x
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
    px = (tx * tile_size + lin % tile_size).astype(jnp.float32)
    py = (ty * tile_size + lin // tile_size).astype(jnp.float32)

    if with_carry:
        # Resume compositing from a previous depth slice's state (rows 0-2
        # color so far, row 3 running transmittance; row 4 — the previous
        # call's blocks_done — is overwritten below).
        accum[0:8] = init_ref[0]
    else:
        accum[0:3] = jnp.zeros((3, npix), jnp.float32)
        accum[3:8] = jnp.zeros((5, npix), jnp.float32)
        accum[3:4] = jnp.ones((1, npix), jnp.float32)

    def get_dma(slot, b):
        return pltpu.make_async_copy(feat_hbm.at[blk0 + b], slab.at[slot], sems.at[slot])

    @pl.when(nblocks > 0)
    def _():
        get_dma(0, 0).start()

    def process_block(b):
        """Composite one feature block; returns the updated transmittance."""
        slot = jax.lax.rem(b, 2)

        @pl.when(b + 1 < nblocks)
        def _():
            get_dma(1 - slot, b + 1).start()

        get_dma(slot, b).wait()
        feats_t = jnp.transpose(slab[slot], (1, 0))  # [pair_block, 16]

        for i in range(blk // cs):  # static sub-chunk loop
            feats = feats_t[i * cs : (i + 1) * cs]  # [cs, 16]
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
            accum[3:4] = trans * cum[-1:]
        return accum[3:4]

    if early_stop > 0.0:
        # Early-stop saturation is judged on COVERABLE pixels only. The
        # reference's covering bbox clamps x_max/y_max to width-1/height-1
        # *exclusive* (rasterize.py:154-198 two-step rounding; ops/
        # projection.covering_bbox), so the frame's last pixel row/column —
        # and, when the frame is not a tile multiple, the edge tiles'
        # out-of-frame pixels — can NEVER receive a contribution: their
        # transmittance stays 1.0 forever. An unmasked max would keep every
        # edge tile compositing all its pairs (measured: 93 edge tiles were
        # ~72% of all composited blocks at real density). Masking them is
        # exact — no pair can touch those pixels.
        if width > 0 and height > 0:
            inframe = ((px < float(width - 1)) & (py < float(height - 1))).astype(
                jnp.float32
            )
        else:
            inframe = jnp.ones((1, npix), jnp.float32)

        def cond(state):
            b, stop = state
            return (b < nblocks) & jnp.logical_not(stop)

        def body(state):
            b, _ = state
            new_trans = process_block(b)
            return b + 1, jnp.max(new_trans * inframe) < early_stop

        blocks_done, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros((), jnp.bool_))
        )

        # On early exit the prefetch for block `blocks_done` is still in
        # flight; drain it so its DMA/semaphore cannot race the next grid
        # step's copies into the same slot.
        @pl.when((blocks_done > 0) & (blocks_done < nblocks))
        def _():
            get_dma(jax.lax.rem(blocks_done, 2), blocks_done).wait()
    else:

        def body(b, _):
            process_block(b)
            return ()

        jax.lax.fori_loop(0, nblocks, body, ())
        blocks_done = nblocks
    # Row 4 records how many feature blocks this tile composited before the
    # transmittance collapsed; the backward kernel walks only those (the
    # skipped tail contributed nothing, so its gradient is exactly zero).
    accum[4:5] = jnp.full((1, npix), blocks_done.astype(jnp.float32))
    out_ref[0] = accum[:]


def build_pair_feat(
    feat: jnp.ndarray,
    pair_gaussian: jnp.ndarray,
    pair_block: int,
    seg_pairs: int = 1 << 21,
) -> jnp.ndarray:
    """Gather per-pair features into dense column-major DMA blocks.

    Returns ``[nblk, 16, pair_block]`` f32 with feature f of pair
    ``b*pair_block + j`` at ``[b, f, j]`` — 64 B/pair physical (a row-major
    ``[P, 16]`` result would be lane-padded to ``[P, 128]`` by the TPU
    (8, 128) tiling: 512 B/pair, the round-2 HBM wall). The row gather is
    chunked over ``seg_pairs``-pair segments so the lane-padded ``[seg, 16]``
    gather output is a bounded scratch (512 MB at the default) instead of an
    O(P) residual; each segment is transposed and packed straight into the
    dense block array. The result is shared between the forward and backward
    kernels (the gather is a significant fraction of a kernel's cost).

    Trailing slots of the last block (and any slots past ``len(pair_gaussian)``)
    point at the sentinel zero feature row, so kernels can DMA whole blocks
    unconditionally.
    """
    p = pair_gaussian.shape[0]
    nf = feat.shape[-1]
    sentinel = jnp.int32(feat.shape[0] - 1)
    nblk = -(-p // pair_block)
    total = nblk * pair_block

    def pack(idx):
        """[S] indices -> [S // pair_block, 16, pair_block] dense blocks."""
        rows = feat[idx]  # [S, nf] (lane-padded scratch, bounded by seg)
        return jnp.transpose(
            rows.T.reshape(nf, idx.shape[0] // pair_block, pair_block), (1, 0, 2)
        )

    if total <= seg_pairs:
        idx = jnp.concatenate(
            [pair_gaussian, jnp.full((total - p,), sentinel, pair_gaussian.dtype)]
        )
        return pack(idx)

    seg = (seg_pairs // pair_block) * pair_block
    nseg = -(-total // seg)
    idx = jnp.concatenate(
        [pair_gaussian, jnp.full((nseg * seg - p,), sentinel, pair_gaussian.dtype)]
    )
    out = jnp.zeros((nseg * (seg // pair_block), nf, pair_block), feat.dtype)

    def body(i, out):
        blkset = pack(jax.lax.dynamic_slice_in_dim(idx, i * seg, seg))
        return jax.lax.dynamic_update_slice_in_dim(
            out, blkset, i * (seg // pair_block), axis=0
        )

    return jax.lax.fori_loop(0, nseg, body, out)


@functools.partial(
    jax.jit, static_argnames=("n_tiles_x", "cfg", "interpret", "width", "height")
)
def forward_tiles_carry(
    pair_feat: jnp.ndarray,
    tile_start: jnp.ndarray,
    tile_count: jnp.ndarray,
    tile_ids: jnp.ndarray,
    init_accum: jnp.ndarray,
    n_tiles_x: int,
    cfg: RasterConfig,
    interpret: bool = False,
    width: int = 0,
    height: int = 0,
) -> jnp.ndarray:
    """One depth slice of the sliced compositor (render/sliced.py): resume
    per-tile compositing from ``init_accum`` ([T, 8, npix]: rows 0-2 color
    so far, row 3 running transmittance) over this slice's dense feature
    blocks, and return the updated accumulator — row 4 holds the feature
    blocks composited by THIS call (the backward's per-slice done-walk
    bound). Tiles with ``tile_count == 0`` pass their state through
    untouched."""
    ts = cfg.tile_size
    cs = cfg.chunk_size
    blk = cfg.pair_block
    assert blk % cs == 0, "pair_block must be a multiple of chunk_size"
    npix = ts * ts
    num_tiles = tile_ids.shape[0]

    kernel = functools.partial(
        _fwd_kernel,
        n_tiles_x=n_tiles_x,
        tile_size=ts,
        chunk_size=cs,
        pair_block=blk,
        early_stop=cfg.early_stop_transmittance,
        with_carry=True,
        width=width,
        height=height,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, 8, npix), lambda t, s, c, i: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, npix), lambda t, s, c, i: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 16, blk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((8, npix), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, npix), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(pair_feat.shape[0]) * blk * npix * 20,
            bytes_accessed=int(pair_feat.shape[0]) * blk * 64
            + num_tiles * npix * 32,
            transcendentals=int(pair_feat.shape[0]) * blk * npix,
        ),
    )(tile_start, tile_count, tile_ids, pair_feat, init_accum)


@functools.partial(
    jax.jit, static_argnames=("n_tiles_x", "cfg", "interpret", "width", "height")
)
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
    width: int = 0,
    height: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rasterize the given tiles with the Pallas kernel.

    Requires block-aligned binning (``align=cfg.pair_block``). Returns
    (color [T, npix, 3], transmittance [T, npix], blocks_done [T] int32 —
    feature blocks composited per tile before early termination; equals
    ceil(count/pair_block) when ``cfg.early_stop_transmittance == 0``).
    """
    ts = cfg.tile_size
    cs = cfg.chunk_size
    blk = cfg.pair_block
    assert blk % cs == 0, "pair_block must be a multiple of chunk_size"
    npix = ts * ts
    num_tiles = tile_ids.shape[0]

    if pair_feat is None:
        pair_feat = build_pair_feat(feat, pair_gaussian, blk)

    kernel = functools.partial(
        _fwd_kernel,
        n_tiles_x=n_tiles_x,
        tile_size=ts,
        chunk_size=cs,
        pair_block=blk,
        early_stop=cfg.early_stop_transmittance,
        width=width,
        height=height,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 8, npix), lambda t, s, c, i: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 16, blk), jnp.float32),
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
    blocks_done = out[:, 4, 0].astype(jnp.int32)  # [T]
    return color.astype(feat.dtype), trans.astype(feat.dtype), blocks_done
