"""Pallas TPU backward rasterization kernel.

Computes d(loss)/d(packed per-gaussian features) for the tile compositor.
Same grid/tile/DMA structure as the forward (raster_fwd.py), but each chunk
additionally writes a [chunk, 16] per-pair gradient slab back to HBM; the
caller reduces per-pair gradients to per-gaussian gradients with one
segment-sum over the pair->gaussian index map.

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
    # inputs
    feat_hbm,
    fwd_out_ref,  # [1, 8, npix]: rows 0-2 C_total, row 3 T_final
    g_out_ref,  # [1, 8, npix]: rows 0-2 dL/dC, row 3 dL/dT_final
    # outputs
    grad_hbm,
    # scratch
    slab,
    in_sems,
    gslab,
    out_sems,
    carry,
    *,
    n_tiles_x: int,
    tile_size: int,
    chunk_size: int,
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

    # carry rows: 0-2 = C_front (color composited so far), 3 = T (transmittance)
    carry[0:3] = jnp.zeros((3, npix), jnp.float32)
    carry[3:4] = jnp.ones((1, npix), jnp.float32)

    t_final = fwd_out_ref[0, 3:4, :]
    g_trans_term = g_out_ref[0, 3:4, :] * t_final  # [1, npix]

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            feat_hbm.at[pl.ds(start + c * cs, cs)], slab.at[slot], in_sems.at[slot]
        )

    def put_dma(slot, c):
        return pltpu.make_async_copy(
            gslab.at[slot], grad_hbm.at[pl.ds(start + c * cs, cs)], out_sems.at[slot]
        )

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            get_dma(1 - slot, c + 1).start()

        get_dma(slot, c).wait()
        feats = slab[slot]  # [cs, 16]
        col = lambda i: feats[:, i][:, None]

        # --- recompute the forward chunk exactly ---
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
        t_k = exclusive_from_inclusive(cum, 1.0) * carry[3:4]  # T in front of k
        w = a * t_k
        inv_om = 1.0 / one_minus

        # --- dL/d(alpha_k), summing the three color channels ---
        d_a = -g_trans_term * inv_om
        d_rgb = []
        for ch in range(3):
            rgb = feats[:, B.FEAT_R + ch][:, None]
            g_c = g_out_ref[0, ch : ch + 1, :]  # [1, npix]
            wc = w * rgb
            cum_wc = cumsum_inclusive(wc)
            c_front_k = carry[ch : ch + 1] + (cum_wc - wc)  # exclusive prefix
            s_behind = fwd_out_ref[0, ch : ch + 1, :] - c_front_k - wc
            d_a += g_c * (rgb * t_k - s_behind * inv_om)
            d_rgb.append(jnp.sum(g_c * w, axis=1, keepdims=True))  # [cs, 1]
            carry[ch : ch + 1] = carry[ch : ch + 1] + cum_wc[-1:]
        d_a = jnp.where(valid, d_a, 0.0)
        carry[3:4] = carry[3:4] * cum[-1:]

        # --- chain through alpha = min(opacity*exp(density), 0.99) ---
        d_raw = jnp.where(raw < MAX_GAUSSIAN_DENSITY, d_a, 0.0)
        d_density = d_raw * raw
        sumpix = lambda v: jnp.sum(v, axis=1, keepdims=True)  # [cs, 1]
        d_opac = sumpix(d_raw * expd)
        d_mean_x = sumpix(d_density * -(cx * dx + cxy * dy))
        d_mean_y = sumpix(d_density * -(cy * dy + cxy * dx))
        d_cx = sumpix(d_density * (-0.5 * dx * dx))
        d_cy = sumpix(d_density * (-0.5 * dy * dy))
        d_cxy = sumpix(d_density * (-dx * dy))

        zeros1 = jnp.zeros((cs, 1), jnp.float32)
        grad = jnp.concatenate(
            [
                d_mean_x, d_mean_y, d_cx, d_cy, d_cxy, d_opac,
                d_rgb[0], d_rgb[1], d_rgb[2],
            ]
            + [zeros1] * (128 - 9),
            axis=1,
        )  # [cs, 128] (9 used + lane padding)

        # Double-buffered write-back: make sure this slot's previous DMA
        # (from chunk c-2) has drained before overwriting the scratch.
        @pl.when(c >= 2)
        def _():
            put_dma(slot, c - 2).wait()

        gslab[slot] = grad
        put_dma(slot, c).start()
        return ()

    jax.lax.fori_loop(0, nchunks, body, ())

    # Drain outstanding write DMAs.
    @pl.when(nchunks >= 2)
    def _():
        put_dma(jax.lax.rem(nchunks - 2, 2), nchunks - 2).wait()

    @pl.when(nchunks >= 1)
    def _():
        put_dma(jax.lax.rem(nchunks - 1, 2), nchunks - 1).wait()


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
    interpret: bool = False,
) -> jnp.ndarray:
    """Gradient of the tile compositor w.r.t. ``feat`` ([N+1, 16]).

    Per-tile inputs: color_tiles [T, npix, 3], trans_tiles [T, npix] (the
    forward outputs) and their cotangents g_color / g_trans, same shapes.
    """
    ts = cfg.tile_size
    cs = cfg.chunk_size
    npix = ts * ts
    num_tiles = tile_ids.shape[0]
    p_pad = pair_gaussian.shape[0] + cs

    pair_feat = jnp.concatenate(
        [feat[pair_gaussian], jnp.zeros((cs, feat.shape[-1]), feat.dtype)], axis=0
    )
    pair_feat = jnp.pad(pair_feat, ((0, 0), (0, 128 - B.NUM_FEATURES)))

    f32 = jnp.float32
    # Pack per-tile forward outputs and cotangents as [T, 8, npix].
    def pack(rgb_tiles, scalar_tiles):
        rgb = jnp.moveaxis(rgb_tiles.astype(f32), 2, 1)  # [T, 3, npix]
        s = scalar_tiles.astype(f32)[:, None, :]  # [T, 1, npix]
        pad = jnp.zeros((num_tiles, 4, npix), f32)
        return jnp.concatenate([rgb, s, pad], axis=1)

    fwd_out = pack(color_tiles, trans_tiles)
    g_out = pack(g_color, g_trans)

    kernel = functools.partial(
        _bwd_kernel, n_tiles_x=n_tiles_x, tile_size=ts, chunk_size=cs
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, npix), lambda t, s, c, i: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, npix), lambda t, s, c, i: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, cs, 128), f32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, cs, 128), f32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((8, npix), f32),
        ],
    )
    pair_grads = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((p_pad, 128), f32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=int(pair_gaussian.shape[0]) * npix * 50,
            bytes_accessed=int(pair_gaussian.shape[0]) * 128
            + num_tiles * npix * 32,
            transcendentals=int(pair_gaussian.shape[0]) * npix,
        ),
    )(tile_start, tile_count, tile_ids, pair_feat, fwd_out, g_out)

    # Rows never written by any tile (inter-segment gaps / capacity tail) may
    # hold garbage; their pair index is the sentinel N, so they fold into the
    # discarded padding row N of dfeat. NaN-guard them anyway.
    idx = jnp.concatenate(
        [pair_gaussian, jnp.full((cs,), feat.shape[0] - 1, pair_gaussian.dtype)]
    )
    sentinel = idx == (feat.shape[0] - 1)
    pair_grads = jnp.where(sentinel[:, None], 0.0, pair_grads[:, : B.NUM_FEATURES])
    d_feat = jax.ops.segment_sum(pair_grads, idx, num_segments=feat.shape[0])
    return d_feat.astype(feat.dtype)
