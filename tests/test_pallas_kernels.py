"""Pallas kernel correctness in interpreter mode (CPU): forward and backward
kernels vs the pure-jnp tile implementations on identical binned inputs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu import RasterConfig
from gsplat_tpu.models.gaussians import GaussianModel
from gsplat_tpu.ops import binning
from gsplat_tpu.render.pipeline import preprocess
from gsplat_tpu.render.tile_jnp import backward_tiles_jnp, forward_tiles_jnp

from fixtures import orbit_camera, random_splat_arrays

CFG = RasterConfig(tile_size=16, chunk_size=8, pair_block=8, max_pairs=4096, use_pallas=True)
WIDTH, HEIGHT = 48, 32
NTX = -(-WIDTH // CFG.tile_size)
NTY = -(-HEIGHT // CFG.tile_size)


@pytest.fixture(scope="module")
def binned():
    rng = np.random.default_rng(5)
    arrays = random_splat_arrays(rng, 150)
    camera = orbit_camera(0.15, width=WIDTH, height=HEIGHT)
    model = GaussianModel.from_arrays(arrays)
    prep = preprocess(model, camera, CFG)
    bins = binning.bin_gaussians(
        prep, WIDTH, HEIGHT, CFG.tile_size, CFG.max_pairs, align=CFG.pair_block
    )
    feat = binning.pack_features(prep)
    tile_ids = jnp.arange(NTX * NTY, dtype=jnp.int32)
    return feat, bins, tile_ids


def test_forward_kernel_matches_jnp(binned):
    from gsplat_tpu.kernels.raster_fwd import forward_tiles_pallas

    feat, bins, tile_ids = binned
    col_j, trans_j = forward_tiles_jnp(
        feat, bins.pair_gaussian, bins.tile_start, bins.tile_count, tile_ids, NTX, CFG
    )
    col_p, trans_p, _ = forward_tiles_pallas(
        feat, bins.pair_gaussian, bins.tile_start, bins.tile_count, tile_ids,
        NTX, CFG, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(col_p), np.asarray(col_j), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(trans_p), np.asarray(trans_j), rtol=1e-5, atol=1e-6)


def test_backward_kernel_matches_jnp(binned):
    from gsplat_tpu.kernels.raster_bwd import backward_tiles_pallas

    feat, bins, tile_ids = binned
    color, trans = forward_tiles_jnp(
        feat, bins.pair_gaussian, bins.tile_start, bins.tile_count, tile_ids, NTX, CFG
    )
    g_color = jax.random.normal(jax.random.key(0), color.shape, color.dtype)
    g_trans = jax.random.normal(jax.random.key(1), trans.shape, trans.dtype)

    d_jnp = backward_tiles_jnp(
        feat, bins.pair_gaussian, bins.tile_start, bins.tile_count, tile_ids,
        color, trans, g_color, g_trans, NTX, CFG,
    )
    d_pallas = backward_tiles_pallas(
        feat, bins.pair_gaussian, bins.tile_start, bins.tile_count, tile_ids,
        color, trans, g_color, g_trans, NTX, CFG, interpret=True,
    )
    got = np.asarray(d_pallas)[:-1]  # drop the padding row
    want = np.asarray(d_jnp)[:-1]
    assert np.isfinite(got).all()
    scale = np.abs(want).max() + 1e-8
    # The kernel reduces via tile-centered pixel moments (one MXU matmul)
    # rather than direct Σ over dx-form integrands; the binomial
    # re-expansion re-orders f32 roundings, so tolerances are a bit looser
    # than bitwise-reduction parity would allow.
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-5 * scale)

    # The sort-based pair->gaussian reduction (production path) must agree
    # with the exact segment_sum path up to f32 cumsum reordering.
    d_sorted = backward_tiles_pallas(
        feat, bins.pair_gaussian, bins.tile_start, bins.tile_count, tile_ids,
        color, trans, g_color, g_trans, NTX, CFG,
        gaussian_counts=bins.gaussian_counts, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(d_sorted)[:-1, :9], got[:, :9], rtol=5e-4, atol=1e-5 * scale
    )


def test_forward_kernel_early_stop(binned):
    """Early termination must not visibly change a converged image."""
    from gsplat_tpu.kernels.raster_fwd import forward_tiles_pallas

    feat, bins, tile_ids = binned
    cfg_es = RasterConfig(
        tile_size=16, chunk_size=8, pair_block=8, max_pairs=4096, early_stop_transmittance=1e-4
    )
    col_ref, _, _ = forward_tiles_pallas(
        feat, bins.pair_gaussian, bins.tile_start, bins.tile_count, tile_ids,
        NTX, CFG, interpret=True,
    )
    col_es, _, _ = forward_tiles_pallas(
        feat, bins.pair_gaussian, bins.tile_start, bins.tile_count, tile_ids,
        NTX, cfg_es, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(col_es), np.asarray(col_ref), atol=2e-4)


def _manual_binned(feat_rows: np.ndarray, tile_pairs, cfg):
    """Hand-built binned inputs: per-tile pair lists, chunk-aligned with
    sentinel padding (what ops.binning produces)."""
    n = feat_rows.shape[0]
    align = cfg.pair_block
    feat = jnp.concatenate(
        [jnp.asarray(feat_rows, jnp.float32), jnp.zeros((1, 16), jnp.float32)]
    )
    pairs, starts, counts = [], [], []
    for ids in tile_pairs:
        starts.append(len(pairs))
        counts.append(len(ids))
        pairs.extend(ids)
        while len(pairs) % align:
            pairs.append(n)  # sentinel -> zero feature row
    return (
        feat,
        jnp.asarray(pairs, jnp.int32),
        jnp.asarray(starts, jnp.int32),
        jnp.asarray(counts, jnp.int32),
    )


def test_zero_opacity_gradient_matches_jnp():
    """A gaussian whose activated opacity underflows to exactly 0 gets zero
    opacity gradient on BOTH backward paths (the alpha > MIN_ALPHA gate
    already zeroes d_alpha everywhere, so 0 is the true gradient — the
    kernel's s1/opac substitution is not a divergence)."""
    from gsplat_tpu.kernels.raster_bwd import backward_tiles_pallas

    cfg = RasterConfig(tile_size=16, chunk_size=8, pair_block=8, max_pairs=64)
    rows = np.zeros((2, 16), np.float32)
    # gaussian 0: normal splat centered on the tile
    rows[0] = [7.5, 7.5, 0.05, 0.05, 0.0, 0.8, 0.9, 0.2, 0.1, 0, 0, 16, 16, 0, 0, 0]
    # gaussian 1: identical but opacity underflowed to 0.0
    rows[1] = rows[0]
    rows[1, 5] = 0.0
    feat, pg, ts_, tc = _manual_binned(rows, [[0, 1]], cfg)
    tile_ids = jnp.asarray([0], jnp.int32)

    color, trans = forward_tiles_jnp(feat, pg, ts_, tc, tile_ids, 1, cfg)
    g_color = jnp.ones_like(color)
    g_trans = jnp.zeros_like(trans)
    d_jnp = backward_tiles_jnp(
        feat, pg, ts_, tc, tile_ids, color, trans, g_color, g_trans, 1, cfg
    )
    d_pal = backward_tiles_pallas(
        feat, pg, ts_, tc, tile_ids, color, trans, g_color, g_trans, 1, cfg,
        interpret=True,
    )
    opac_col = binning.FEAT_OPACITY
    assert float(d_jnp[1, opac_col]) == 0.0
    assert float(d_pal[1, opac_col]) == 0.0
    assert abs(float(d_jnp[0, opac_col])) > 0.0  # live gaussian does get one
    want = np.asarray(d_jnp)[:-1]
    np.testing.assert_allclose(
        np.asarray(d_pal)[:-1], want, rtol=5e-3, atol=1e-5 * np.abs(want).max()
    )


def test_far_tile_splat_gradient_error_bounded():
    """Bound the moment-reduction cancellation error for splats whose mean is
    hundreds of pixels outside the rasterized tile (the kernel re-expands
    Σ d*(mx-px)^k around the tile center; error grows ~ mx^2 * eps * Σ|d|).

    Adversarial setup: huge splats (conic ~ 1e-5) at 300-500 px from the
    tile, with a sign-alternating color cotangent so Σ d_density nearly
    cancels (the worst case ADVICE.md flags)."""
    from gsplat_tpu.kernels.raster_bwd import backward_tiles_pallas

    cfg = RasterConfig(tile_size=16, chunk_size=8, pair_block=8, max_pairs=64)
    rng = np.random.default_rng(7)
    n = 6
    rows = np.zeros((n, 16), np.float32)
    for i in range(n):
        mx = rng.uniform(300.0, 500.0) * rng.choice([-1.0, 1.0])
        my = rng.uniform(300.0, 500.0) * rng.choice([-1.0, 1.0])
        c = rng.uniform(0.5e-5, 2e-5)
        rows[i] = [
            mx, my, c, c, c * 0.1, 0.9,
            rng.uniform(), rng.uniform(), rng.uniform(),
            -600, -600, 600, 600, 0, 0, 0,
        ]
    feat, pg, ts_, tc = _manual_binned(rows, [list(range(n))], cfg)
    tile_ids = jnp.asarray([0], jnp.int32)

    color, trans = forward_tiles_jnp(feat, pg, ts_, tc, tile_ids, 1, cfg)
    # checkerboard cotangent: d_density sign-cancels within each pair
    lin = np.arange(cfg.pixels_per_tile)
    checker = ((lin % 16 + lin // 16) % 2 * 2 - 1).astype(np.float32)
    g_color = jnp.asarray(np.stack([checker] * 3, -1)[None], jnp.float32)
    g_trans = jnp.zeros_like(trans)

    d_jnp = backward_tiles_jnp(
        feat, pg, ts_, tc, tile_ids, color, trans, g_color, g_trans, 1, cfg
    )
    d_pal = backward_tiles_pallas(
        feat, pg, ts_, tc, tile_ids, color, trans, g_color, g_trans, 1, cfg,
        interpret=True,
    )
    got = np.asarray(d_pal)[:-1]
    want = np.asarray(d_jnp)[:-1]
    assert np.isfinite(got).all()
    # Measured bound: at 500 px offset with sign-cancelling cotangents the
    # conic/mean/opacity columns err by up to ~4e-2 of their column scale
    # (the binomial re-expansion amplifies the reduction's accumulation
    # noise by mx^2; the constant depends on summation order, so the real
    # MXU path is a few x worse than CPU-interpret). The absolute mean /
    # opacity errors stay ~1e-8; a few-percent relative noise on huge-splat
    # conic grads in this adversarial corner is far below optimizer noise,
    # so no dx-form fallback is warranted. Ordinary-cotangent parity is
    # pinned at 5e-3 by test_backward_kernel_matches_jnp.
    scale = np.abs(want).max(axis=0) + 1e-12
    err = np.abs(got - want).max(axis=0)
    assert (err <= 0.1 * scale + 1e-7).all(), (err, scale)


def test_kernels_with_sharded_tile_ids(binned):
    """Kernels must honor non-contiguous global tile ids (shard_map slices)."""
    from gsplat_tpu.kernels.raster_fwd import forward_tiles_pallas

    feat, bins, tile_ids = binned
    full_col, _ = forward_tiles_jnp(
        feat, bins.pair_gaussian, bins.tile_start, bins.tile_count, tile_ids, NTX, CFG
    )
    sel = jnp.asarray([3, 1, 5], dtype=jnp.int32)
    col_p, _, _ = forward_tiles_pallas(
        feat, bins.pair_gaussian[...], bins.tile_start[sel], bins.tile_count[sel],
        sel, NTX, CFG, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(col_p), np.asarray(full_col[sel]), rtol=1e-5, atol=1e-6
    )


def test_compacted_reduction_matches_full(binned):
    """The compacted (written-blocks-only) gradient reduction must agree
    with the full sort-based path — with real early termination producing
    partial blocks_done, with a roomy capacity (compact branch) AND with a
    too-small capacity (lax.cond falls back to the full branch)."""
    from gsplat_tpu.kernels.raster_bwd import backward_tiles_pallas
    from gsplat_tpu.kernels.raster_fwd import forward_tiles_pallas

    feat, bins, tile_ids = binned
    # Opaque-ified, frame-covering features so early stop actually
    # truncates multi-block tiles: alpha ~0.95 at every pixel of every
    # bound pair -> T < 1e-2 after two pairs.
    n_real = feat.shape[0] - 1
    feat_op = feat.at[:-1, binning.FEAT_OPACITY].set(0.95)
    feat_op = feat_op.at[:-1, binning.FEAT_CONIC_X].set(1e-6)
    feat_op = feat_op.at[:-1, binning.FEAT_CONIC_Y].set(1e-6)
    feat_op = feat_op.at[:-1, binning.FEAT_CONIC_XY].set(0.0)
    feat_op = feat_op.at[:-1, binning.FEAT_X_MIN].set(0.0)
    feat_op = feat_op.at[:-1, binning.FEAT_Y_MIN].set(0.0)
    feat_op = feat_op.at[:-1, binning.FEAT_X_MAX].set(float(WIDTH))
    feat_op = feat_op.at[:-1, binning.FEAT_Y_MAX].set(float(HEIGHT))
    cfg_es = RasterConfig(
        tile_size=16, chunk_size=8, pair_block=8, max_pairs=4096,
        early_stop_transmittance=1e-2, use_pallas=True,
    )
    color, trans, blocks_done = forward_tiles_pallas(
        feat_op, bins.pair_gaussian, bins.tile_start, bins.tile_count,
        tile_ids, NTX, cfg_es, interpret=True,
    )
    total_blocks = int(np.sum(-(-np.asarray(bins.tile_count) // cfg_es.pair_block)))
    done_blocks = int(np.sum(np.asarray(blocks_done)))
    assert 0 < done_blocks < total_blocks  # early stop really truncated

    g_color = jax.random.normal(jax.random.key(0), color.shape, color.dtype)
    g_trans = jax.random.normal(jax.random.key(1), trans.shape, trans.dtype)

    def run(cfg):
        return np.asarray(
            backward_tiles_pallas(
                feat_op, bins.pair_gaussian, bins.tile_start, bins.tile_count,
                tile_ids, color, trans, g_color, g_trans, NTX, cfg,
                blocks_done=blocks_done, gaussian_counts=bins.gaussian_counts,
                interpret=True,
            )
        )

    want = run(cfg_es)  # full sort-based reduction
    roomy = dataclasses.replace(
        cfg_es, reduce_pairs=(done_blocks + 8) * cfg_es.pair_block
    )
    tight = dataclasses.replace(cfg_es, reduce_pairs=cfg_es.pair_block)
    scale = np.abs(want).max() + 1e-8
    np.testing.assert_allclose(run(roomy), want, rtol=5e-4, atol=1e-5 * scale)
    np.testing.assert_allclose(run(tight), want, rtol=0, atol=0)  # same branch
