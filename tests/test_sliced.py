"""Depth-sliced lazy binning (render/sliced.py) vs the standard pipeline.

The sliced path must reproduce the single-sort Pallas compositor — image,
transmittance and parameter gradients — in exact mode (early stop off, every
slice runs) and in early-stop mode (the production real-density config),
while actually exiting the slice loop early on a saturating scene. All
checks run the REAL kernel code paths in interpreter mode on the CPU mesh
(same tier as tests/test_pallas_kernels.py).
"""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from fixtures import make_camera, random_splat_arrays  # noqa: E402
from gsplat_tpu import GaussianModel, RasterConfig  # noqa: E402
from gsplat_tpu.ops.camera import CameraArrays  # noqa: E402
from gsplat_tpu.render.pipeline import render_traced  # noqa: E402

BASE = RasterConfig(
    tile_size=16, chunk_size=8, pair_block=8, max_pairs=1 << 13,
    use_pallas=True, force_pallas_interpret=True,
    early_stop_transmittance=0.0,
)


def _model(n=300, seed=7, opaque=False):
    rng = np.random.default_rng(seed)
    arrays = random_splat_arrays(rng, n)
    if opaque:
        arrays["opacity_logits"] = np.full(n, 4.0, np.float32)
    return GaussianModel.from_arrays(arrays), rng


def test_sliced_forward_matches_standard_exact():
    model, _ = _model()
    cam = CameraArrays.from_params(make_camera())
    img_ref, tr_ref = render_traced(model, cam, 64, 48, BASE)
    cfg = dataclasses.replace(BASE, slice_pairs=1 << 10)
    img_s, tr_s = render_traced(model, cam, 64, 48, cfg)
    # Slice boundaries re-chunk the per-tile scans -> 1-2 ULP reassociation.
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tr_s), np.asarray(tr_ref), atol=1e-6)


def test_sliced_forward_tiny_slices_and_odd_resolution():
    """Many tiny slices + a non-tile-aligned framebuffer: same image."""
    model, _ = _model(n=200, seed=3)
    cam = CameraArrays.from_params(make_camera(width=50, height=35))
    img_ref, tr_ref = render_traced(model, cam, 50, 35, BASE)
    cfg = dataclasses.replace(BASE, slice_pairs=128)
    img_s, tr_s = render_traced(model, cam, 50, 35, cfg)
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tr_s), np.asarray(tr_ref), atol=1e-6)


def test_sliced_gradients_match_standard():
    model, rng = _model()
    cam = CameraArrays.from_params(make_camera())
    w_img = jnp.asarray(rng.normal(size=(48, 64, 3)).astype(np.float32))
    w_tr = jnp.asarray(rng.normal(size=(48, 64)).astype(np.float32))

    def loss(m, cfg):
        img, tr = render_traced(m, cam, 64, 48, cfg)
        return jnp.sum(img * w_img) + jnp.sum(tr * w_tr)

    cfg = dataclasses.replace(BASE, slice_pairs=1 << 10)
    g_ref = jax.grad(lambda m: loss(m, BASE))(model)
    g_s = jax.grad(lambda m: loss(m, cfg))(model)
    for name in ["means", "log_scales", "quats", "opacity_logits", "sh"]:
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_s, name))
        scale = max(np.abs(a).max(), 1e-8)
        # f32 reassociation across slice boundaries + the sort-based
        # reduction; same tolerance class as the standard fast reduction.
        assert np.abs(a - b).max() / scale < 5e-5, name


def test_sliced_early_stop_matches_and_exits_early():
    """Opaque scene: early-stop image matches the standard early-stop path
    and the slice loop exits before exhausting the budget."""
    import math

    from gsplat_tpu.ops import binning as B
    from gsplat_tpu.render.pipeline import preprocess_traced
    from gsplat_tpu.render.sliced import _forward_impl, _prepare_sliced

    model, rng = _model(n=400, opaque=True)
    cam = CameraArrays.from_params(make_camera())
    es = dataclasses.replace(BASE, early_stop_transmittance=1e-4)
    cfg = dataclasses.replace(es, slice_pairs=512)
    img_ref, tr_ref = render_traced(model, cam, 64, 48, es)
    img_s, tr_s = render_traced(model, cam, 64, 48, cfg)
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tr_s), np.asarray(tr_ref), atol=1e-6)

    # gradients under early stop
    w_img = jnp.asarray(rng.normal(size=(48, 64, 3)).astype(np.float32))

    def loss(m, c):
        img, _ = render_traced(m, cam, 64, 48, c)
        return jnp.sum(img * w_img)

    g_ref = jax.grad(lambda m: loss(m, es))(model)
    g_s = jax.grad(lambda m: loss(m, cfg))(model)
    for name in ["means", "opacity_logits", "sh"]:
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_s, name))
        assert np.abs(a - b).max() / max(np.abs(a).max(), 1e-8) < 5e-5, name

    # the loop terminates before k_max on a finite scene
    prep = preprocess_traced(model, cam, 64, 48, cfg)
    feat = B.pack_features(prep).astype(jnp.float32)
    n = model.num_gaussians
    order, w0s, w1s = _prepare_sliced(prep, 16, 4, 3)
    _, _, out = _forward_impl(feat, order, w0s, w1s, 64, 48, cfg)
    k_max = math.ceil(cfg.max_pairs / cfg.slice_pairs)
    assert int(out["k"]) < k_max
    # every emitted slice's pairs were consumed in depth order
    assert int(out["g0"]) <= n


def test_sliced_viewspace_probe_gradient():
    """The densify trainer's zero-offset viewspace probe differentiates
    through the sliced path (same numbers as the standard path)."""
    model, rng = _model(n=150, seed=11)
    cam = CameraArrays.from_params(make_camera())
    w_img = jnp.asarray(rng.normal(size=(48, 64, 3)).astype(np.float32))
    offset = jnp.zeros((model.num_gaussians, 2), jnp.float32)

    def loss(off, cfg):
        img, _ = render_traced(model, cam, 64, 48, cfg, off)
        return jnp.sum(img * w_img)

    cfg = dataclasses.replace(BASE, slice_pairs=1 << 10)
    g_ref = jax.grad(lambda o: loss(o, BASE))(offset)
    g_s = jax.grad(lambda o: loss(o, cfg))(offset)
    a, b = np.asarray(g_ref), np.asarray(g_s)
    assert np.abs(a - b).max() / max(np.abs(a).max(), 1e-8) < 5e-5


def test_sliced_overflow_drops_deepest_and_stays_finite():
    """Demand beyond ceil(max_pairs/slice_pairs) slices: deepest splats are
    dropped (front-to-back budget), output stays finite, and the kept
    prefix matches a full render restricted to the consumed gaussians."""
    model, _ = _model(n=300)
    cam = CameraArrays.from_params(make_camera())
    tight = dataclasses.replace(
        BASE, max_pairs=256, slice_pairs=128
    )  # k_max = 2 slices of 128
    img, tr = render_traced(model, cam, 64, 48, tight)
    assert np.isfinite(np.asarray(img)).all()
    assert np.isfinite(np.asarray(tr)).all()
    # More budget -> more pairs composited: strictly no less opacity
    roomy = dataclasses.replace(BASE, slice_pairs=1 << 10)
    _, tr_full = render_traced(model, cam, 64, 48, roomy)
    assert float(jnp.mean(tr)) >= float(jnp.mean(tr_full)) - 1e-6


def test_sliced_bwd_chunked_gather_path():
    """The backward regather uses build_pair_feat, whose chunked path
    (pair count above seg_pairs) rounds its block count up to a segment
    multiple — the sliced backward must still line up its gradient slab
    with the slice's own block count. Exercise the chunked path by
    shrinking seg_pairs to force >1 gather segment at test scale."""
    from unittest import mock

    from gsplat_tpu.kernels import raster_fwd

    model, rng = _model(n=250, seed=5)
    cam = CameraArrays.from_params(make_camera())
    w_img = jnp.asarray(rng.normal(size=(48, 64, 3)).astype(np.float32))

    def loss(m, cfg):
        img, _ = render_traced(m, cam, 64, 48, cfg)
        return jnp.sum(img * w_img)

    cfg = dataclasses.replace(BASE, slice_pairs=1 << 10)
    g_ref = jax.grad(lambda m: loss(m, cfg))(model)

    orig = raster_fwd.build_pair_feat

    def tiny_seg(feat, pair_gaussian, pair_block, seg_pairs=1 << 21):
        return orig(feat, pair_gaussian, pair_block, seg_pairs=256)

    with mock.patch.object(raster_fwd, "build_pair_feat", tiny_seg):
        # render/sliced.py imports build_pair_feat inside _bwd, so the
        # module attribute patch is what it resolves.
        jax.clear_caches()
        g_chunked = jax.grad(lambda m: loss(m, cfg))(model)
    jax.clear_caches()
    for name in ["means", "opacity_logits", "sh"]:
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_chunked, name))
        np.testing.assert_allclose(b, a, rtol=0, atol=np.abs(a).max() * 1e-6)


def test_sliced_compact_cross_slice_reduction():
    """reduce_pairs > 0 with slice_pairs: the cross-slice compact gradient
    reduction matches the per-slice exact reduction, and an undersized
    capacity falls back to the exact replay (bitwise: it IS the per-slice
    path)."""
    model, rng = _model(n=300)
    cam = CameraArrays.from_params(make_camera())
    w_img = jnp.asarray(rng.normal(size=(48, 64, 3)).astype(np.float32))

    def loss(m, cfg):
        img, _ = render_traced(m, cam, 64, 48, cfg)
        return jnp.sum(img * w_img)

    es = dataclasses.replace(BASE, early_stop_transmittance=1e-4)
    cfg_slice = dataclasses.replace(es, slice_pairs=1 << 10)
    cfg_comp = dataclasses.replace(cfg_slice, reduce_pairs=1 << 12)
    cfg_ovf = dataclasses.replace(cfg_slice, reduce_pairs=64)
    g_ref = jax.grad(lambda m: loss(m, cfg_slice))(model)
    g_c = jax.grad(lambda m: loss(m, cfg_comp))(model)
    g_o = jax.grad(lambda m: loss(m, cfg_ovf))(model)
    for name in ["means", "log_scales", "quats", "opacity_logits", "sh"]:
        a = np.asarray(getattr(g_ref, name))
        c = np.asarray(getattr(g_c, name))
        o = np.asarray(getattr(g_o, name))
        assert np.abs(a - c).max() / max(np.abs(a).max(), 1e-8) < 5e-5, name
        np.testing.assert_array_equal(o, a, err_msg=name)


def test_sliced_window_fallback_sparse_alive():
    """Force the slice loop's full-N fallback branch: most gaussians are
    culled (behind the camera), so a slice_pairs-wide window of the sorted
    axis cannot supply a full slice and the exact full-N branch must run.
    The image and gradients must still match the standard path."""
    model, rng = _model(n=600, seed=11)
    # Push ~90% of the gaussians behind the camera (frustum-culled) in an
    # interleaved pattern — long empty runs on the depth-sorted axis.
    means = np.asarray(model.means).copy()
    dead = rng.uniform(size=600) < 0.9
    means[dead, 2] = -5.0
    model = GaussianModel(
        means=jnp.asarray(means), log_scales=model.log_scales,
        quats=model.quats, opacity_logits=model.opacity_logits, sh=model.sh,
    )
    cam = CameraArrays.from_params(make_camera())

    img_ref, tr_ref = render_traced(model, cam, 64, 48, BASE)
    cfg = dataclasses.replace(BASE, slice_pairs=64, pair_block=8)
    img_s, tr_s = render_traced(model, cam, 64, 48, cfg)
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_ref), atol=1e-6)

    w_img = jnp.asarray(rng.normal(size=(48, 64, 3)).astype(np.float32))

    def loss(m, c):
        img, _ = render_traced(m, cam, 64, 48, c)
        return jnp.sum(img * w_img)

    g_ref = jax.grad(lambda m: loss(m, BASE))(model)
    g_s = jax.grad(lambda m: loss(m, cfg))(model)
    for name in ["means", "opacity_logits", "sh"]:
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_s, name))
        assert np.abs(a - b).max() / max(np.abs(a).max(), 1e-8) < 5e-5, name
