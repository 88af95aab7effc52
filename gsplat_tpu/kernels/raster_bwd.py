"""Pallas TPU backward rasterization kernel.

Computes d(loss)/d(packed per-gaussian features) for the tile compositor.
Same grid/tile/DMA structure as the forward (raster_fwd.py): per-pair
features arrive as dense column-major ``[nblk, 16, pair_block]`` HBM blocks
(64 B/pair), and each processed block additionally writes one gradient block
of the same dense layout back to HBM; the host side then reduces per-pair
gradients to per-gaussian gradients with a sort-based segmented cumsum (see
backward_tiles_pallas). Each block is composited in ``chunk_size``-pair
sub-chunks whose per-pair gradient rows accumulate in a VMEM ``[pair_block,
16]`` scratch, transposed once per block for the dense write-back.

Numerical design — the gradient walk runs *front-to-back*, in the exact
order and with the exact intermediate values of the forward pass (a
recompute-based backward: nothing is saved but the forward outputs). The
classic back-to-front walk divides the running transmittance by (1 - alpha)
every step, which underflows to 0/0 once T collapses; here the only division
is in the suffix-color term S_k = C_total - C_front_k - contrib_k with
denominator 1 - alpha >= 0.01 (alpha is clamped at 0.99, rasterize.py:285):

  dC/d(alpha_k)      = rgb_k * T_k - S_k / (1 - alpha_k)
  dT_final/d(alpha_k) = -T_final / (1 - alpha_k)

then through alpha = min(opacity * exp(density), 0.99) (clamp gates the
gradient) and the quadratic form density(dx, dy; conic) of
rasterize.py:279-283. Validity gates (alpha > 1/255, density <= 0, bbox
containment) zero the gradient exactly as torch's masked indexing does in
the reference (rasterize.py:291-303).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsplat_tpu.config import MAX_GAUSSIAN_DENSITY, MIN_ALPHA, RasterConfig
from gsplat_tpu.kernels.scans import cumprod_inclusive, cumsum_inclusive, exclusive_from_inclusive
from gsplat_tpu.ops import binning as B


def _bwd_kernel(
    # scalar prefetch
    tile_start_ref,
    tile_count_ref,
    tile_ids_ref,
    blocks_done_ref,
    # inputs
    feat_hbm,  # [nblk, 16, pair_block] dense feature blocks
    # non-carry: fwd_out_ref [1, 8, npix] (rows 0-2 C_total, row 3 T_final)
    # then g_out_ref, basis_ref; with_carry: g_out_ref, basis_ref,
    # carry_in_ref [1, 2, npix] (the walk state after the previous depth
    # slice — fwd_out is folded into it, so it is not re-read).
    # outputs: grad_hbm (+ carry_out_ref [1, 2, npix] with_carry)
    *refs,
    n_tiles_x: int,
    tile_size: int,
    chunk_size: int,
    pair_block: int,
    with_carry: bool = False,
):
    if with_carry:
        (
            g_out_ref, basis_ref, carry_in_ref,
            grad_hbm, carry_out_ref,
            slab, in_sems, gbuf, gslab, out_sems, carry,
        ) = refs
        fwd_out_ref = None
    else:
        (
            fwd_out_ref, g_out_ref, basis_ref,
            grad_hbm,
            slab, in_sems, gbuf, gslab, out_sems, carry,
        ) = refs
    t = pl.program_id(0)
    start = tile_start_ref[t]  # in pairs; a multiple of pair_block
    count = tile_count_ref[t]
    tid = tile_ids_ref[t]  # global tile index (differs from t under sharding)
    cs = chunk_size
    blk = pair_block
    npix = tile_size * tile_size
    blk0 = start // blk
    nblocks = (count + blk - 1) // blk
    # Blocks the forward actually composited before early termination; the
    # tail's gradient is exactly zero (those pairs never touched the
    # output), so the walk simply STOPS there — the tail's slab rows are
    # never written, and the host-side reduction masks them out by the
    # written interval (cheaper than ~300K zero-block DMAs per frame at
    # real-scene density, where early stop skips ~95% of blocks).
    done = jnp.minimum(blocks_done_ref[t], nblocks)

    tx = tid % n_tiles_x
    ty = tid // n_tiles_x
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
    px = (tx * tile_size + lin % tile_size).astype(jnp.float32)
    py = (ty * tile_size + lin // tile_size).astype(jnp.float32)

    # Per-channel quantities collapse to two per-pixel running rows
    # (the cotangent row g_ch is constant along the pair axis, so it
    # commutes with the front-to-back prefix sums):
    #   row 0: S0 = Σ_ch g_ch * (C_total_ch - C_front_ch) + g_T * T_final
    #          ("suffix signal still to be occluded", pre-contracted with
    #          the cotangent; the transmittance cotangent term shares the
    #          -1/(1-alpha) suffix structure, so it rides the same row)
    #   row 1: T  = running transmittance
    if with_carry:
        carry[0:2] = carry_in_ref[0]
    else:
        carry[0:1] = (
            g_out_ref[0, 0:1, :] * fwd_out_ref[0, 0:1, :]
            + g_out_ref[0, 1:2, :] * fwd_out_ref[0, 1:2, :]
            + g_out_ref[0, 2:3, :] * fwd_out_ref[0, 2:3, :]
            + g_out_ref[0, 3:4, :] * fwd_out_ref[0, 3:4, :]
        )
        carry[1:2] = jnp.ones((1, npix), jnp.float32)

    def get_dma(slot, b):
        return pltpu.make_async_copy(feat_hbm.at[blk0 + b], slab.at[slot], in_sems.at[slot])

    def put_dma(slot, b):
        return pltpu.make_async_copy(gslab.at[slot], grad_hbm.at[blk0 + b], out_sems.at[slot])

    @pl.when(done > 0)
    def _():
        get_dma(0, 0).start()

    def body(b, _):
        slot = jax.lax.rem(b, 2)

        # Double-buffered write-back: make sure this slot's previous DMA
        # (from block b-2) has drained before overwriting the scratch.
        @pl.when(b >= 2)
        def _():
            put_dma(slot, b - 2).wait()

        compute_block(b, slot)
        put_dma(slot, b).start()
        return ()

    def compute_block(b, slot):
        @pl.when(b + 1 < done)
        def _():
            get_dma(1 - slot, b + 1).start()

        get_dma(slot, b).wait()
        feats_t = jnp.transpose(slab[slot], (1, 0))  # [pair_block, 16]

        for i in range(blk // cs):  # static sub-chunk loop
            compute_chunk(feats_t[i * cs : (i + 1) * cs], i)

        gslab[slot] = jnp.transpose(gbuf[...], (1, 0))  # [16, pair_block]

    def compute_chunk(feats, i):
        col = lambda j: feats[:, j][:, None]

        # --- recompute the forward sub-chunk exactly ---
        dx = col(B.FEAT_MEAN_X) - px
        dy = col(B.FEAT_MEAN_Y) - py
        cx, cy, cxy = col(B.FEAT_CONIC_X), col(B.FEAT_CONIC_Y), col(B.FEAT_CONIC_XY)
        density = -0.5 * (cx * dx * dx + cy * dy * dy) - cxy * dx * dy
        expd = jnp.exp(density)
        raw = col(B.FEAT_OPACITY) * expd
        alpha = jnp.minimum(raw, MAX_GAUSSIAN_DENSITY)
        inside = (
            (px >= col(B.FEAT_X_MIN))
            & (px < col(B.FEAT_X_MAX))
            & (py >= col(B.FEAT_Y_MIN))
            & (py < col(B.FEAT_Y_MAX))
        )
        valid = (alpha > MIN_ALPHA) & (density <= 0.0) & inside
        a = jnp.where(valid, alpha, 0.0)  # [cs, npix]

        one_minus = 1.0 - a
        cum = cumprod_inclusive(one_minus)
        t_k = exclusive_from_inclusive(cum, 1.0) * carry[1:2]  # T in front of k
        w = a * t_k
        inv_om = 1.0 / one_minus

        # --- dL/d(alpha_k) ---
        # Per channel, dC_ch/d(a_k) = rgb_ch * T_k - S_behind_ch / (1 - a_k)
        # with S_behind_ch = C_total_ch - carry_ch - cumsum(w * rgb_ch).
        # Contracted with the per-pixel cotangent rows g_ch (constant along
        # k) everything folds into u = Σ_ch rgb_ch * g_ch and ONE cumsum:
        #   Σ_ch g_ch * S_behind_ch (+ the g_T term) = S0 - cumsum_k(w * u)
        # u and cum_wu stay on the VPU: they sit in the middle of the
        # chunk's dependency chain, and routing them through the MXU
        # serializes VPU<->MXU round trips (measured ~4% slower than the
        # doubling scan; the end-of-chunk moments matmul overlaps fine).
        g_r = g_out_ref[0, 0:1, :]
        g_g = g_out_ref[0, 1:2, :]
        g_b = g_out_ref[0, 2:3, :]
        u = (
            col(B.FEAT_R) * g_r + col(B.FEAT_G) * g_g + col(B.FEAT_B) * g_b
        )  # [cs, npix]
        wu = w * u
        cum_wu = cumsum_inclusive(wu)
        s_behind_g = carry[0:1] - cum_wu  # Σ_ch g_ch * S_behind at k (+ g_T)
        d_a = u * t_k - s_behind_g * inv_om
        d_a = jnp.where(valid, d_a, 0.0)
        carry[0:1] = carry[0:1] - cum_wu[-1:]
        carry[1:2] = carry[1:2] * cum[-1:]

        # --- chain through alpha = min(opacity*exp(density), 0.99) ---
        d_raw = jnp.where(raw < MAX_GAUSSIAN_DENSITY, d_a, 0.0)
        d_density = d_raw * raw  # [cs, npix]

        # Every per-pair gradient is a pixel reduction. Cross-lane VPU
        # reductions are slow, so reduce on the MXU instead: all nine are
        # recovered from ONE [2*cs, npix] @ [npix, 16] matmul. The
        # d_density block contracts against the constant polynomial basis
        # {1, px, py, px^2, py^2, px*py} (tile-local px — bounded magnitudes
        # keep the binomial re-expansion of Σ d*(mx-px)^k well-conditioned);
        # the w block contracts against this tile's color-cotangent columns
        # {g_r, g_g, g_b} (basis cols 6-8), yielding d_rgb = Σ g_ch * w
        # without materializing three g_ch*w products on the VPU.
        lhs = jnp.concatenate([d_density, w], axis=0)  # [2*cs, npix]
        mom = jax.lax.dot_general(
            lhs, basis_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # Mosaic supports DEFAULT (1-pass bf16: ~0.4% rounding, too
            # noisy for gradients) and HIGHEST (6-pass, f32-exact) only.
            precision=jax.lax.Precision.HIGHEST,
        )  # [2*cs, 16]
        s1 = mom[0:cs, 0:1]  # Σ d
        spx = mom[0:cs, 1:2]  # Σ d*px
        spy = mom[0:cs, 2:3]  # Σ d*py
        spxx = mom[0:cs, 3:4]  # Σ d*px^2
        spyy = mom[0:cs, 4:5]  # Σ d*py^2
        spxy = mom[0:cs, 5:6]  # Σ d*px*py
        d_rgb = [mom[cs : 2 * cs, 6 + ch : 7 + ch] for ch in range(3)]

        # Tile-centered mean; dx = mx - px holds in any shared origin, and
        # centering halves the coordinate magnitudes in the cancellation.
        half = (tile_size - 1) / 2.0
        mx = col(B.FEAT_MEAN_X) - ((tx * tile_size).astype(jnp.float32) + half)
        my = col(B.FEAT_MEAN_Y) - ((ty * tile_size).astype(jnp.float32) + half)
        sx = mx * s1 - spx  # Σ d*dx
        sy = my * s1 - spy  # Σ d*dy
        sxx = mx * mx * s1 - 2.0 * mx * spx + spxx  # Σ d*dx^2
        syy = my * my * s1 - 2.0 * my * spy + spyy  # Σ d*dy^2
        sxy = mx * my * s1 - mx * spy - my * spx + spxy  # Σ d*dx*dy

        opac = col(B.FEAT_OPACITY)  # [cs, 1], as are cx/cy/cxy
        d_mean_x = -(cx * sx + cxy * sy)
        d_mean_y = -(cy * sy + cxy * sx)
        d_cx = -0.5 * sxx
        d_cy = -0.5 * syy
        d_cxy = -sxy
        # Σ d_raw*expd == Σ d_density / opac (opac is per-pair constant).
        # At opac == 0 the true gradient is also exactly 0: alpha == 0 fails
        # the alpha > MIN_ALPHA validity gate, so d_a (hence d_raw) is zeroed
        # at every pixel — the jnp path's Σ d_raw*expd agrees (pinned by
        # test_zero_opacity_gradient_matches_jnp).
        d_opac = jnp.where(opac > 0.0, s1 / opac, 0.0)

        gbuf[i * cs : (i + 1) * cs] = jnp.concatenate(
            [d_mean_x, d_mean_y, d_cx, d_cy, d_cxy, d_opac] + d_rgb
            + [jnp.zeros((cs, 16 - 9), jnp.float32)],
            axis=1,
        )  # [cs, 16] (FEAT_* lane order + padding)

    jax.lax.fori_loop(0, done, body, ())

    # Drain outstanding write DMAs.
    @pl.when(done >= 2)
    def _():
        put_dma(jax.lax.rem(done - 2, 2), done - 2).wait()

    @pl.when(done >= 1)
    def _():
        put_dma(jax.lax.rem(done - 1, 2), done - 1).wait()

    if with_carry:
        # Walk state after this slice, threaded into the next slice's call
        # by the sliced backward (render/sliced.py).
        carry_out_ref[0] = carry[0:2]


def sorted_grad_cumsum(ids: jnp.ndarray, cols9):
    """Sort pair-gradient rows by gaussian id and return (sorted_ids,
    cum9 [P, 9]) — the inclusive per-column cumsum in sorted order that
    every segment reduction differences at segment ends.

    ``cols9``: nine dense [P] f32 columns (extract them straight from the
    [nblk, 16, blk] gradient-slab layout — a materialized [P, 9] row view
    lane-pads 14x on TPU). Measured on the v5e at 1.45M and 2.8M rows: the
    columns riding the sort as VALUE OPERANDS beats sorting (id, iota) and
    row-gathering a [P, 9] view by the permutation by 3-33 ms — the
    gather's padded output plus the transposes around its per-column
    cumsums dominate. Flat per-column cumsums on sorted columns scan
    dense.
    """
    sorted_ops = jax.lax.sort((ids, *cols9), num_keys=1, is_stable=False)
    cum9 = jnp.stack([jnp.cumsum(c) for c in sorted_ops[1:]], axis=1)
    return sorted_ops[0], cum9


def pack_tile_rows(rgb_tiles: jnp.ndarray, scalar_tiles: jnp.ndarray) -> jnp.ndarray:
    """Pack per-tile rgb [T, npix, 3] + scalar [T, npix] as the kernels'
    [T, 8, npix] row layout (rows 0-2 rgb, row 3 scalar, rows 4-7 zero)."""
    f32 = jnp.float32
    num_tiles, npix = scalar_tiles.shape
    rgb = jnp.moveaxis(rgb_tiles.astype(f32), 2, 1)  # [T, 3, npix]
    s = scalar_tiles.astype(f32)[:, None, :]  # [T, 1, npix]
    pad = jnp.zeros((num_tiles, 4, npix), f32)
    return jnp.concatenate([rgb, s, pad], axis=1)


def reduction_basis(g_color: jnp.ndarray, tile_size: int) -> jnp.ndarray:
    """The backward kernel's per-tile reduction basis [T, npix, 16]:
    cols 0-5 the constant moment polynomials {1, px, py, px^2, py^2, px*py}
    in tile-local pixel coordinates, cols 6-8 this tile's color cotangent
    as columns (see _bwd_kernel's moments matmul)."""
    f32 = jnp.float32
    ts = tile_size
    npix = ts * ts
    num_tiles = g_color.shape[0]
    lin = jnp.arange(npix, dtype=f32)
    bx = lin % ts - (ts - 1) / 2.0
    by = lin // ts - (ts - 1) / 2.0
    moments = jnp.stack(
        [jnp.ones_like(bx), bx, by, bx * bx, by * by, bx * by], axis=1
    )  # [npix, 6]
    return jnp.concatenate(
        [
            jnp.broadcast_to(moments, (num_tiles, npix, 6)),
            g_color.astype(f32),
            jnp.zeros((num_tiles, npix, 16 - 9), f32),
        ],
        axis=2,
    )


@functools.partial(jax.jit, static_argnames=("n_tiles_x", "cfg", "interpret"))
def backward_tiles_carry(
    pair_feat: jnp.ndarray,
    tile_start: jnp.ndarray,
    tile_count: jnp.ndarray,
    tile_ids: jnp.ndarray,
    blocks_done: jnp.ndarray,
    g_out: jnp.ndarray,
    basis: jnp.ndarray,
    carry_in: jnp.ndarray,
    n_tiles_x: int,
    cfg: RasterConfig,
    interpret: bool = False,
):
    """One depth slice of the sliced backward (render/sliced.py): walk this
    slice's feature blocks front-to-back from the per-tile carry state
    ``carry_in`` [T, 2, npix] (row 0 the cotangent-contracted suffix signal,
    row 1 the running transmittance — initialized by the caller from the
    forward's FINAL outputs exactly like the non-carry kernel does
    internally), writing per-pair gradient blocks and the carry state after
    the slice.

    Returns (pair_grads [nblk, 16, pair_block] f32, carry_out [T, 2, npix]).
    The caller masks unwritten rows (early-terminated tails / skipped
    tiles) before reducing — same contract as backward_tiles_pallas."""
    ts = cfg.tile_size
    cs = cfg.chunk_size
    blk = cfg.pair_block
    npix = ts * ts
    num_tiles = tile_ids.shape[0]
    nblk_out = pair_feat.shape[0]

    kernel = functools.partial(
        _bwd_kernel, n_tiles_x=n_tiles_x, tile_size=ts, chunk_size=cs,
        pair_block=blk, with_carry=True,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, npix), lambda t, s, c, i, d: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npix, 16), lambda t, s, c, i, d: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, npix), lambda t, s, c, i, d: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 2, npix), lambda t, s, c, i, d: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 16, blk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((blk, 16), jnp.float32),
            pltpu.VMEM((2, 16, blk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, npix), jnp.float32),
        ],
    )
    pair_grads, carry_out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nblk_out, 16, blk), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 2, npix), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=int(nblk_out) * blk * npix * 50,
            bytes_accessed=int(nblk_out) * blk * 128 + num_tiles * npix * 32,
            transcendentals=int(nblk_out) * blk * npix,
        ),
    )(tile_start, tile_count, tile_ids, blocks_done, pair_feat, g_out, basis, carry_in)
    return pair_grads, carry_out


@functools.partial(
    jax.jit, static_argnames=("n_tiles_x", "cfg", "interpret")
)
def backward_tiles_pallas(
    feat: jnp.ndarray,
    pair_gaussian: jnp.ndarray,
    tile_start: jnp.ndarray,
    tile_count: jnp.ndarray,
    tile_ids: jnp.ndarray,
    color_tiles: jnp.ndarray,
    trans_tiles: jnp.ndarray,
    g_color: jnp.ndarray,
    g_trans: jnp.ndarray,
    n_tiles_x: int,
    cfg: RasterConfig,
    blocks_done: jnp.ndarray | None = None,
    gaussian_counts: jnp.ndarray | None = None,
    interpret: bool = False,
    pair_feat: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Gradient of the tile compositor w.r.t. ``feat`` ([N+1, 16]).

    Per-tile inputs: color_tiles [T, npix, 3], trans_tiles [T, npix] (the
    forward outputs) and their cotangents g_color / g_trans, same shapes.
    ``blocks_done`` [T] int32 (from the forward kernel) limits the walk to
    the feature blocks the forward composited; None walks every block.

    The per-pair -> per-gaussian reduction: XLA's segment_sum scatter-adds
    one row at a time (~0.5s at 4M pairs on v5e); instead the pair grads are
    sorted by gaussian id (lax.sort is cheap on TPU) and segment sums come
    from a cumsum differenced at segment boundaries, with boundaries derived
    from ``gaussian_counts`` (binning's kept-pairs-per-gaussian, id order).
    The cumsum re-orders f32 additions (error ~1e-5 relative to the global
    gradient scale); pass ``gaussian_counts=None`` (or set
    ``cfg.exact_grad_reduction``) to use the exact segment_sum path.
    """
    ts = cfg.tile_size
    cs = cfg.chunk_size
    blk = cfg.pair_block
    assert blk % cs == 0, "pair_block must be a multiple of chunk_size"
    npix = ts * ts
    num_tiles = tile_ids.shape[0]
    nblk_out = -(-pair_gaussian.shape[0] // blk)
    p_pad = nblk_out * blk

    if pair_feat is None:
        from gsplat_tpu.kernels.raster_fwd import build_pair_feat

        pair_feat = build_pair_feat(feat, pair_gaussian, blk)

    f32 = jnp.float32
    fwd_out = pack_tile_rows(color_tiles, trans_tiles)
    g_out = pack_tile_rows(g_color, g_trans)
    basis = reduction_basis(g_color, ts)

    if blocks_done is None:
        blocks_done = -(-tile_count // blk)
    blocks_done = blocks_done.astype(jnp.int32)

    kernel = functools.partial(
        _bwd_kernel, n_tiles_x=n_tiles_x, tile_size=ts, chunk_size=cs,
        pair_block=blk,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, npix), lambda t, s, c, i, d: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, npix), lambda t, s, c, i, d: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npix, 16), lambda t, s, c, i, d: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 16, blk), f32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((blk, 16), f32),
            pltpu.VMEM((2, 16, blk), f32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, npix), f32),
        ],
    )
    pair_grads = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblk_out, 16, blk), f32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=int(pair_gaussian.shape[0]) * npix * 50,
            bytes_accessed=int(pair_gaussian.shape[0]) * 128
            + num_tiles * npix * 32,
            transcendentals=int(pair_gaussian.shape[0]) * npix,
        ),
    )(tile_start, tile_count, tile_ids, blocks_done, pair_feat, fwd_out, g_out, basis)

    idx = jnp.concatenate(
        [
            pair_gaussian,
            jnp.full((p_pad - pair_gaussian.shape[0],), feat.shape[0] - 1,
                     pair_gaussian.dtype),
        ]
    )
    n = feat.shape[0] - 1

    # Rows the kernel actually wrote: each tile's first blocks_done blocks.
    # Everything else — the early-terminated tails AND (under tile sharding)
    # tiles this call never rasterized — is uninitialized HBM *with real
    # gaussian ids in pair_gaussian*; mask it to exact zero before reducing
    # (the skipped pairs never touched the forward output, so zero is their
    # exact gradient).
    def written_mask():
        delta = jnp.zeros((p_pad + 1,), jnp.int32)
        delta = delta.at[tile_start].add(1, mode="drop")
        delta = delta.at[tile_start + blocks_done * blk].add(-1, mode="drop")
        return jnp.cumsum(delta[:-1]) > 0

    if gaussian_counts is None or cfg.exact_grad_reduction:
        # Exact per-row scatter-add.
        written = written_mask()
        valid_row = written & (idx != n)
        rows = jnp.stack(
            [
                jnp.where(written, pair_grads[:, j, :].reshape(-1), 0.0)
                for j in range(9)
            ],
            axis=1,
        )  # [P, 9]
        d_feat = jax.ops.segment_sum(
            rows, jnp.where(valid_row, idx, n), num_segments=feat.shape[0]
        )
        return jnp.pad(d_feat, ((0, 0), (0, B.NUM_FEATURES - 9))).astype(feat.dtype)

    def full_reduction():
        # Sort-based reduction: sort the 9 gradient columns by gaussian id
        # (unwritten rows carry exact-zero gradients after the mask, so they
        # contribute nothing to their segment; the sentinel id N sorts
        # last), then difference a cumsum at segment ends. Boundaries come
        # from gaussian_counts, so the whole thing is sorts + elementwise —
        # no scatter. VALID ONLY when this call rasterizes every tile of the
        # binning that produced pair_gaussian (segments cover the buffer
        # from slot 0 and gaussian_counts describes exactly this call's
        # pairs). Tile shards satisfy this by binning their own strided
        # tile subset (parallel/shard.py), so this fast path is live under
        # sharding too.
        written = written_mask()
        cols = [
            jnp.where(written, pair_grads[:, j, :].reshape(-1), 0.0)
            for j in range(9)
        ]
        _, cum9 = sorted_grad_cumsum(idx, cols)
        ends = jnp.cumsum(gaussian_counts)
        at = jnp.maximum(ends - 1, 0)
        gathered = jnp.where((ends > 0)[:, None], cum9[at], 0.0)
        prev = jnp.concatenate([jnp.zeros((1, 9), f32), gathered[:-1]], axis=0)
        sums = gathered - prev  # [N, 9] in gaussian id order
        return jnp.pad(sums, ((0, 1), (0, B.NUM_FEATURES - 9))).astype(feat.dtype)

    cap_blk = max(cfg.reduce_pairs // blk, 1)
    if cfg.reduce_pairs <= 0 or cap_blk >= nblk_out:
        return full_reduction()

    def compact_reduction():
        # Compacted reduction: with early termination at real-scene density
        # the kernel writes only a few percent of the blocks (each tile's
        # first blocks_done). Gather JUST those — block-granular row
        # gathers amortize the per-index cost over 64*pair_block bytes —
        # into a [cap_blk * pair_block]-pair buffer, and run the same
        # sort+cumsum reduction at that scale. Segment boundaries can no
        # longer come from gaussian_counts (the compact buffer holds a
        # subset of each gaussian's pairs), so each gaussian's segment end
        # is recovered with one scatter-max of positions by id and an
        # exclusive cummax for the previous end.
        i32 = jnp.int32
        done = blocks_done
        out_off = jnp.cumsum(done) - done  # [T] compact block offsets
        total_blk = jnp.sum(done)
        slot = jnp.arange(cap_blk, dtype=i32)
        t_iota = jnp.arange(num_tiles, dtype=i32)
        mark = jnp.zeros((cap_blk,), i32).at[
            jnp.where(done > 0, out_off, cap_blk)
        ].max(t_iota, mode="drop")
        tile_of = jax.lax.cummax(mark)  # owning tile per compact slot
        src_blk = tile_start[tile_of] // blk + (slot - out_off[tile_of])
        valid_slot = slot < total_blk
        src_blk = jnp.where(valid_slot, src_blk, 0)
        gblocks = jnp.where(
            valid_slot[:, None, None], pair_grads[src_blk], 0.0
        )  # [cap_blk, 16, blk]
        ids_blk = idx.reshape(nblk_out, blk)[src_blk]  # [cap_blk, blk]
        ids_c = jnp.where(valid_slot[:, None], ids_blk, n).reshape(-1)
        c_total = cap_blk * blk
        cols = [gblocks[:, j, :].reshape(-1) for j in range(9)]
        sorted_ids, cum9 = sorted_grad_cumsum(ids_c, cols)
        lastpos = jnp.full((feat.shape[0],), -1, i32).at[sorted_ids].max(
            jnp.arange(c_total, dtype=i32), mode="drop"
        )
        prev_end = jnp.concatenate(
            [jnp.full((1,), -1, i32), jax.lax.cummax(lastpos)[:-1]]
        )
        have = lastpos >= 0
        g_at = cum9[jnp.maximum(lastpos, 0)]
        g_prev = jnp.where(
            (prev_end >= 0)[:, None], cum9[jnp.maximum(prev_end, 0)], 0.0
        )
        sums = jnp.where(have[:, None], g_at - g_prev, 0.0)  # [N+1, 9]
        return jnp.pad(sums, ((0, 0), (0, B.NUM_FEATURES - 9))).astype(feat.dtype)

    return jax.lax.cond(
        jnp.sum(blocks_done) <= cap_blk, compact_reduction, full_reduction
    )
