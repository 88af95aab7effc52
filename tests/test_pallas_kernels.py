"""Pallas kernel correctness in interpreter mode (CPU): forward and backward
kernels vs the pure-jnp tile implementations on identical binned inputs."""

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

CFG = RasterConfig(tile_size=16, chunk_size=8, max_pairs=4096, use_pallas=True)
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
        prep, WIDTH, HEIGHT, CFG.tile_size, CFG.max_pairs, align=CFG.chunk_size
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
        tile_size=16, chunk_size=8, max_pairs=4096, early_stop_transmittance=1e-4
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
