"""Synthetic scene fixtures: random splat models, cameras, and on-disk
COLMAP/PLY scenes (the formats are simple enough to generate in-test,
SURVEY.md §4)."""

from __future__ import annotations

import math
import os

import numpy as np

from gsplat_tpu.io import colmap
from gsplat_tpu.io.ply import save_splat_arrays
from gsplat_tpu.ops.camera import CameraParams


def random_splat_arrays(rng: np.random.Generator, n: int, extent: float = 1.0):
    """Raw-parameter arrays for a random splat cloud.

    ~20% of the gaussians are deliberately offscreen or behind the camera so
    culling / zero-count binning paths are exercised (real scenes always
    contain such splats)."""
    means = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    outliers = rng.uniform(size=n) < 0.2
    kind = rng.uniform(size=n)
    far_out = np.where(kind < 0.5, 50.0 * extent, -50.0)  # offscreen | behind
    axis = rng.integers(0, 3, n)
    for i in range(n):
        if outliers[i]:
            if far_out[i] < 0:
                means[i, 2] = -50.0  # behind the default test cameras
            else:
                means[i, axis[i] % 2] = far_out[i]
    return {
        "means": means,
        "log_scales": rng.uniform(-4.0, -1.5, (n, 3)).astype(np.float32),
        "quats": rng.normal(size=(n, 4)).astype(np.float32),
        "opacity_logits": rng.uniform(-1.0, 4.0, n).astype(np.float32),
        "sh": (rng.normal(size=(n, 16, 3)) * 0.3).astype(np.float32),
    }


def make_camera(width: int = 64, height: int = 48, distance: float = 4.0) -> CameraParams:
    """A camera at +z looking toward the origin (identity rotation, so the
    world->camera transform is a pure translation along z)."""
    fx = fy = 0.8 * width
    fov_x = 2.0 * math.atan(width / (2.0 * fx))
    fov_y = 2.0 * math.atan(height / (2.0 * fy))
    return CameraParams(
        width=width,
        height=height,
        fov_x=fov_x,
        fov_y=fov_y,
        focal_x=fx,
        focal_y=fy,
        qvec=(1.0, 0.0, 0.0, 0.0),
        tvec=(0.0, 0.0, distance),
    )


def orbit_camera(angle: float, width: int = 64, height: int = 48, distance: float = 4.0) -> CameraParams:
    """Camera orbiting the origin in the xz plane by ``angle`` radians."""
    base = make_camera(width, height, distance)
    half = angle / 2.0
    qvec = (math.cos(half), 0.0, math.sin(half), 0.0)  # rotation about +y
    return CameraParams(
        width=base.width,
        height=base.height,
        fov_x=base.fov_x,
        fov_y=base.fov_y,
        focal_x=base.focal_x,
        focal_y=base.focal_y,
        qvec=qvec,
        tvec=(0.0, 0.0, distance),
    )


def write_synthetic_scene(
    root: str,
    rng: np.random.Generator,
    n_gaussians: int = 200,
    width: int = 64,
    height: int = 48,
    n_images: int = 2,
    scale_factor: int = 1,
    two_cameras: bool = False,
) -> str:
    """Materialize a full on-disk scene in the layout the reference expects:
    ``sparse/0/{images,cameras}.bin``, ``images_{k}/`` JPEGs, and an Inria
    checkpoint at ``model/point_cloud/iteration_30000/point_cloud.ply``.

    With ``two_cameras`` odd-indexed images reference a second COLMAP camera
    (id 2, same resolution, 1.5x the focal length) — a multi-camera
    reconstruction, which multi-view code paths must resolve per image via
    ``BaseImage.camera_id`` (the reference's cam_info[1] hardcode is a
    single-view quirk, rasterize.py:336).

    Returns the scene root (the model lives at ``<root>/model``).
    """
    from PIL import Image

    cam = make_camera(width * scale_factor, height * scale_factor)
    cameras = {
        1: colmap.Camera(
            id=1,
            model="PINHOLE",
            width=width * scale_factor,
            height=height * scale_factor,
            params=np.array(
                [cam.focal_x, cam.focal_y, width * scale_factor / 2, height * scale_factor / 2],
                dtype=np.float64,
            ),
        )
    }
    if two_cameras:
        cameras[2] = colmap.Camera(
            id=2,
            model="PINHOLE",
            width=width * scale_factor,
            height=height * scale_factor,
            params=np.array(
                [1.5 * cam.focal_x, 1.5 * cam.focal_y,
                 width * scale_factor / 2, height * scale_factor / 2],
                dtype=np.float64,
            ),
        )
    images = {}
    for i in range(n_images):
        angle = 0.15 * i
        ocam = orbit_camera(angle)
        images[i] = colmap.BaseImage(
            id=i,
            qvec=np.array(ocam.qvec),
            tvec=np.array(ocam.tvec),
            camera_id=2 if (two_cameras and i % 2 == 1) else 1,
            name=f"IMG_{i:04d}.JPG",
            xys=np.zeros((0, 2)),
            point3D_ids=np.zeros((0,), dtype=np.int64),
        )
    colmap.write_intrinsics_binary(os.path.join(root, "sparse/0/cameras.bin"), cameras)
    colmap.write_extrinsics_binary(os.path.join(root, "sparse/0/images.bin"), images)
    # SfM point cloud (train-from-scratch seed): sample in-frustum points.
    n_pts = max(n_gaussians // 2, 8)
    colmap.write_points3D_binary(
        os.path.join(root, "sparse/0/points3D.bin"),
        xyzs=rng.uniform(-1.0, 1.0, (n_pts, 3)),
        rgbs=rng.integers(0, 256, (n_pts, 3)),
    )

    img_dir = os.path.join(root, f"images_{scale_factor}")
    os.makedirs(img_dir, exist_ok=True)
    for i in range(n_images):
        arr = rng.uniform(0, 255, (height, width, 3)).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"IMG_{i:04d}.JPG"))

    arrays = random_splat_arrays(rng, n_gaussians)
    save_splat_arrays(
        os.path.join(root, "model/point_cloud/iteration_30000/point_cloud.ply"),
        arrays,
    )
    return root
