"""Component-level parity: gsplat_tpu ops vs the torch reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from gsplat_tpu.models.gaussians import GaussianModel
from gsplat_tpu.ops import projection as P
from gsplat_tpu.ops.camera import camera_center
from gsplat_tpu.ops.sh import sh_to_rgb

from fixtures import random_splat_arrays, orbit_camera
from reference_harness import load_reference, reference_preprocess


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    arrays = random_splat_arrays(rng, 300)
    camera = orbit_camera(0.3, width=64, height=48)
    return arrays, camera


def test_quaternion_to_rotation_matrix(scene):
    import torch

    ref_rasterize, _, _, _ = load_reference()
    rng = np.random.default_rng(1)
    q = rng.normal(size=(4, 10)).astype(np.float32)
    q = q / np.linalg.norm(q, axis=0, keepdims=True)
    ref = ref_rasterize.quaternion_to_rotation_matrix(torch.tensor(q)).numpy()
    ours = np.asarray(
        __import__("gsplat_tpu.ops.quaternion", fromlist=["quaternion_to_rotation_matrix"])
        .quaternion_to_rotation_matrix(jnp.asarray(q.T))
    )
    # reference output is [3, 3, B]; ours is [B, 3, 3]
    np.testing.assert_allclose(ours, np.moveaxis(ref, -1, 0), rtol=1e-6, atol=1e-6)


def test_preprocess_intermediates_match(scene):
    arrays, camera = scene
    ref = reference_preprocess(arrays, camera)
    model = GaussianModel.from_arrays(arrays)
    w2c_t, full_proj_t = camera.matrices()

    np.testing.assert_allclose(np.asarray(w2c_t), ref["w2c_t"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(full_proj_t), ref["full_proj_t"], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(model.covariances()), ref["cov3d"], rtol=1e-4, atol=1e-6
    )

    rgb = sh_to_rgb(model.means, model.sh, camera_center(w2c_t), degree=3)
    np.testing.assert_allclose(np.asarray(rgb), ref["rgb"], rtol=1e-4, atol=1e-5)

    cam_means = P.project_to_camera_space(model.means, w2c_t)
    np.testing.assert_allclose(np.asarray(cam_means), ref["cam_means"], rtol=1e-4, atol=1e-5)

    screen = P.project_to_screen(
        model.means, full_proj_t, cam_means[:, 2], camera.width, camera.height
    )
    np.testing.assert_allclose(
        np.asarray(screen), ref["screen_means"], rtol=1e-4, atol=2e-3
    )

    cov2d = P.ewa_project_covariance(
        model.covariances(),
        cam_means,
        camera.tan_fov_x,
        camera.tan_fov_y,
        camera.focal_x,
        camera.focal_y,
        w2c_t,
    )
    cov2d = jnp.where((cam_means[:, 2] < 0.2)[:, None, None], 0.0, cov2d)
    np.testing.assert_allclose(np.asarray(cov2d), ref["cov2d"], rtol=1e-4, atol=1e-5)


def test_projection_matrix_values():
    """Golden check of the perspective matrix against hand-computed values."""
    from gsplat_tpu.ops.camera import projection_matrix

    p = np.asarray(projection_matrix(1.0, 0.8))
    assert p[0, 0] == pytest.approx(1.0 / np.tan(0.5))
    assert p[1, 1] == pytest.approx(1.0 / np.tan(0.4))
    assert p[3, 2] == 1.0
    assert p[2, 2] == pytest.approx(100.0 / (100.0 - 0.01))
    assert p[2, 3] == pytest.approx(-(100.0 * 0.01) / (100.0 - 0.01))
    assert p[2, 0] == p[2, 1] == 0.0


def test_sh_degrees_monotone_refinement(scene):
    """Degrees 0-2 against the reference evaluator (not only degree 3)."""
    import torch

    arrays, camera = scene
    _, ref_sh, ref_utils, _ = load_reference()
    from reference_harness import arrays_to_fake_ply

    model = GaussianModel.from_arrays(arrays)
    w2c_t, _ = camera.matrices()
    colors = ref_utils.read_color_components(arrays_to_fake_ply(arrays))
    means_t = torch.tensor(arrays["means"]).float()
    w2c_torch = torch.tensor(np.asarray(w2c_t))
    for degree in range(4):
        ref = ref_sh.sh_to_rgb(means_t, colors, w2c_torch, degree=degree).numpy()
        ours = np.asarray(
            sh_to_rgb(model.means, model.sh, camera_center(w2c_t), degree=degree)
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5, err_msg=f"degree {degree}")


def test_covering_bbox_matches_reference(scene):
    import torch

    arrays, camera = scene
    ref_rasterize, _, _, _ = load_reference()
    ref = reference_preprocess(arrays, camera)

    bbox_blocks = ref_rasterize.compute_covering_bbox(
        torch.tensor(ref["screen_means"]), torch.tensor(ref["cov2d"]),
        camera.width, camera.height,
    )
    bs = ref_rasterize.BLOCK_SIZE
    ref_bbox = np.stack(
        [
            np.clip(bbox_blocks[:, 0].numpy() * bs, 0, camera.width - 1),
            np.clip(bbox_blocks[:, 1].numpy() * bs, 0, camera.height - 1),
            np.clip(bbox_blocks[:, 2].numpy() * bs, 0, camera.width - 1),
            np.clip(bbox_blocks[:, 3].numpy() * bs, 0, camera.height - 1),
        ],
        axis=-1,
    )
    ours = np.asarray(
        P.covering_bbox(
            jnp.asarray(ref["screen_means"]), jnp.asarray(ref["cov2d"]),
            camera.width, camera.height,
        )
    )
    np.testing.assert_array_equal(ours, ref_bbox)


def test_conics_match_reference(scene):
    arrays, camera = scene
    ref = reference_preprocess(arrays, camera)
    cov2d = ref["cov2d"]
    det = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 1, 0] * cov2d[:, 0, 1]
    det_inv = np.where(det == 0, 0.0, 1.0 / det)
    expected = np.stack(
        [cov2d[:, 1, 1] * det_inv, cov2d[:, 0, 0] * det_inv, -cov2d[:, 0, 1] * det_inv],
        axis=-1,
    )
    conics, _ = P.conic_from_cov2d(jnp.asarray(cov2d))
    np.testing.assert_allclose(np.asarray(conics), expected, rtol=1e-6, atol=1e-7)


def test_soa_preprocess_matches_aos_twin():
    """preprocess_gaussians_from_params (the live SoA path) and
    preprocess_gaussians (the AoS formulation kept as readable
    documentation/oracle) must stay numerically interchangeable."""
    import jax.numpy as jnp

    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import orbit_camera, random_splat_arrays

    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.ops.camera import CameraArrays
    from gsplat_tpu.ops import projection as P

    rng = np.random.default_rng(17)
    model = GaussianModel.from_arrays(random_splat_arrays(rng, 400))
    camera = orbit_camera(0.3, width=96, height=64)
    cam = CameraArrays.from_params(camera)
    kw = dict(
        w2c_t=cam.w2c_t, full_proj_t=cam.full_proj_t,
        tan_fov_x=cam.tan_fov[0], tan_fov_y=cam.tan_fov[1],
        focal_x=cam.focal[0], focal_y=cam.focal[1],
        width=96, height=64, strict_parity=True,
    )
    rgb = jnp.ones((model.num_gaussians, 3), jnp.float32) * 0.5
    soa = P.preprocess_gaussians_from_params(
        means=model.means, scales=model.scales(), quats=model.quats,
        opacity=model.opacity(), rgb=rgb, **kw,
    )
    aos = P.preprocess_gaussians(
        means=model.means, cov3d=model.covariances(),
        opacity=model.opacity(), rgb=rgb, **kw,
    )
    np.testing.assert_allclose(np.asarray(soa.screen_means), np.asarray(aos.screen_means), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(soa.conics), np.asarray(aos.conics), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(soa.depth), np.asarray(aos.depth), rtol=1e-6, atol=1e-6)
    assert (np.asarray(soa.bbox) == np.asarray(aos.bbox)).all()
    assert (np.asarray(soa.cull_bbox) == np.asarray(aos.cull_bbox)).all()
    assert (np.asarray(soa.active) == np.asarray(aos.active)).all()
