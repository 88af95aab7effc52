"""End-to-end image parity: oracle + tile renderer vs the torch reference."""

import numpy as np
import pytest

from gsplat_tpu import RasterConfig, render, render_reference_oracle
from gsplat_tpu.models.gaussians import GaussianModel

from fixtures import orbit_camera, random_splat_arrays

CFG = RasterConfig(tile_size=16, chunk_size=8, pair_block=8, max_pairs=1 << 14, use_pallas=False)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    arrays = random_splat_arrays(rng, 300)
    camera = orbit_camera(0.2, width=64, height=48)
    return arrays, camera


def test_oracle_matches_reference(scene):
    from reference_harness import reference_render

    arrays, camera = scene
    ref_img, ref_trans = reference_render(arrays, camera)
    model = GaussianModel.from_arrays(arrays)
    img, trans = render_reference_oracle(model, camera, CFG)
    np.testing.assert_allclose(np.asarray(img), ref_img, rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(trans), ref_trans, rtol=1e-3, atol=2e-4)


def test_tile_renderer_matches_reference(scene):
    from reference_harness import reference_render

    arrays, camera = scene
    ref_img, ref_trans = reference_render(arrays, camera)
    model = GaussianModel.from_arrays(arrays)
    img, trans = render(model, camera, CFG)
    np.testing.assert_allclose(np.asarray(img), ref_img, rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(trans), ref_trans, rtol=1e-3, atol=2e-4)


def test_tile_renderer_matches_oracle_tightly(scene):
    """Tile renderer vs oracle (both ours): bit-level agreement expected up
    to f32 reduction-order differences."""
    arrays, camera = scene
    model = GaussianModel.from_arrays(arrays)
    img_o, trans_o = render_reference_oracle(model, camera, CFG)
    img_t, trans_t = render(model, camera, CFG)
    np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_o), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(trans_t), np.asarray(trans_o), rtol=1e-5, atol=1e-6)


def test_tile_size_invariance(scene):
    """The render must not depend on the tile/chunk decomposition."""
    arrays, camera = scene
    model = GaussianModel.from_arrays(arrays)
    base = np.asarray(render(model, camera, CFG)[0])
    for ts, cs in [(32, 16), (16, 32), (32, 64)]:
        cfg = RasterConfig(tile_size=ts, chunk_size=cs, max_pairs=1 << 14, use_pallas=False)
        img = np.asarray(render(model, camera, cfg)[0])
        np.testing.assert_allclose(img, base, rtol=1e-5, atol=1e-6, err_msg=f"ts={ts} cs={cs}")


def test_determinism(scene):
    arrays, camera = scene
    model = GaussianModel.from_arrays(arrays)
    a = np.asarray(render(model, camera, CFG)[0])
    b = np.asarray(render(model, camera, CFG)[0])
    np.testing.assert_array_equal(a, b)


def test_alpha_cull_exactness_on_big_transparent_splats():
    """Opacity-aware tile culling (ops/projection._alpha_cull_bbox) stresses:
    large anisotropic splats at low opacity cull most of their 3-sigma bbox's
    tiles, which must not change the image vs the reference at all."""
    from reference_harness import reference_render

    rng = np.random.default_rng(13)
    arrays = random_splat_arrays(rng, 80)
    arrays["log_scales"] = rng.uniform(-2.0, 0.3, arrays["log_scales"].shape).astype(
        np.float32
    )  # big splats spanning many tiles
    arrays["opacity_logits"] = rng.uniform(-6.0, -2.0, arrays["opacity_logits"].shape).astype(
        np.float32
    )  # opacities ~0.002..0.12: cull radius far inside 3 sigma
    camera = orbit_camera(0.1, width=96, height=64)
    model = GaussianModel.from_arrays(arrays)
    ref_img, _ = reference_render(arrays, camera)
    img, _ = render(model, camera, RasterConfig(tile_size=16, chunk_size=8, pair_block=8, max_pairs=1 << 15, use_pallas=False))
    np.testing.assert_allclose(np.asarray(img), ref_img, rtol=1e-3, atol=2e-4)


def test_culled_scene_renders_black():
    """All gaussians behind the camera -> empty image, full transmittance."""
    rng = np.random.default_rng(3)
    arrays = random_splat_arrays(rng, 50)
    # camera: X_cam = X + (0,0,4), so z=-100 -> cam_z=-96 < 0.2 -> culled
    arrays["means"][:, 2] = -100.0
    camera = orbit_camera(0.0, width=32, height=32)
    model = GaussianModel.from_arrays(arrays)
    img, trans = render(model, camera, RasterConfig(tile_size=16, chunk_size=8, pair_block=8, max_pairs=4096, use_pallas=False))
    assert float(np.abs(np.asarray(img)).max()) == 0.0
    assert float(np.asarray(trans).min()) == 1.0


def test_render_depth_expected_values():
    """Expected-depth map: an opaque splat at known camera depth must read
    back that depth at its center; empty pixels carry depth near*(1-T)=~0
    coverage with transmittance ~1."""
    import jax.numpy as jnp

    from gsplat_tpu import render_depth
    from gsplat_tpu.ops.camera import CameraArrays
    from fixtures import make_camera

    n = 1
    arrays = {
        "means": np.zeros((n, 3), np.float32),  # camera at +4z -> depth 4
        "log_scales": np.array([[-1.5, -1.2, -1.4]], np.float32),
        # slightly rotated: a perfectly axis-aligned splat has conic_xy == 0
        # and the reference's strict-parity any-zero quirk would skip it
        "quats": np.tile(np.array([0.9, 0.1, 0.2, 0.3], np.float32), (n, 1)),
        "opacity_logits": np.full((n,), 8.0, np.float32),  # ~opaque
        "sh": np.zeros((n, 16, 3), np.float32),
    }
    camera = make_camera(48, 48)
    model = GaussianModel.from_arrays(arrays)
    cam = CameraArrays.from_params(camera)
    cfg = RasterConfig(tile_size=16, chunk_size=8, pair_block=8, max_pairs=1 << 10, use_pallas=False)
    depth, trans = render_depth(model, cam, 48, 48, cfg, near=0.2, far=100.0)
    center = float(depth[24, 24])
    t_center = float(trans[24, 24])
    # alpha is clamped at 0.99, so a tiny residual transmittance remains;
    # the covered part composites depth 4.0
    assert abs(center - 4.0 * (1 - t_center) - 0.2 * t_center) < 0.05, center
    corner_t = float(trans[0, 0])
    assert corner_t > 0.98
    # gradients flow through the depth map too
    import jax

    g = jax.grad(lambda m: jnp.sum(render_depth(m, cam, 48, 48, cfg)[0]))(model)
    assert np.isfinite(np.asarray(g.means)).all()
