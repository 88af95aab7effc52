"""Per-gaussian preprocessing: projection, EWA splatting, conics, bboxes.

This is the vectorized-over-N half of the renderer (reference components
C10, C12-C16 in SURVEY.md). Everything here is embarrassingly parallel and
maps to plain jnp under ``jit``; only binning + compositing need kernels.

Parity targets (reference file:line):
  * 3D covariance from scales/quats: rasterize.py:89-120.
  * camera-space projection:          rasterize.py:80-86.
  * clip/NDC/screen projection:       rasterize.py:374-391.
  * frustum culling at z < 0.2:       rasterize.py:377-378, 388.
  * EWA 2D covariance:                rasterize.py:201-252.
  * conic ("sigma"):                  rasterize.py:395-411.
  * covering bbox:                    rasterize.py:154-198, 413-420.
  * depth sort keys:                  rasterize.py:424-425.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gsplat_tpu.config import (
    BLOCK_SIZE,
    COV2D_LOWPASS,
    EIGENVALUE_FLOOR,
    EWA_TAN_CLAMP,
    FRUSTUM_NEAR_Z,
    GAUSSIAN_SPREAD,
    PERSPECTIVE_EPS,
)
from gsplat_tpu.ops.quaternion import normalize_quaternion, quaternion_to_rotation_matrix


def covariance_from_scales_quats(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """3D covariance ``Cov = (R S)(R S)^T`` per gaussian.

    Args:
      scales: ``[N, 3]`` *activated* (already exp'd) per-axis scales.
      quats: ``[N, 4]`` raw quaternions (normalized here, rasterize.py:112).
    Returns:
      ``[N, 3, 3]``.
    """
    rot = quaternion_to_rotation_matrix(normalize_quaternion(quats))  # [N,3,3]
    m = rot * scales[:, None, :]  # R @ diag(s), columns scaled
    return jnp.matmul(m, jnp.swapaxes(m, -1, -2), precision="highest")


def project_to_camera_space(means: jnp.ndarray, w2c_t: jnp.ndarray) -> jnp.ndarray:
    """World -> camera coordinates with the row-vector transposed matrix
    (rasterize.py:80-86): ``p_cam = p @ R^T + t``."""
    return jnp.matmul(means, w2c_t[:3, :3], precision="highest") + w2c_t[3, :3]


def project_to_screen(
    means: jnp.ndarray,
    full_proj_t: jnp.ndarray,
    cam_z: jnp.ndarray,
    width: int,
    height: int,
) -> jnp.ndarray:
    """Project world means to pixel coordinates.

    Follows rasterize.py:374-391: homogeneous clip coords via the combined
    row-vector transform, culled points (cam_z < 0.2) zeroed *before* the
    perspective divide, epsilon-guarded divide, then NDC -> pixel mapping
    ``((ndc + 1) * [W, H] - 1) / 2``.

    Returns ``[N, 2]`` pixel-space centers.
    """
    clip = jnp.matmul(means, full_proj_t[:3, :], precision="highest") + full_proj_t[3, :]
    culled = cam_z < FRUSTUM_NEAR_Z
    clip = jnp.where(culled[:, None], 0.0, clip)
    inv_w = 1.0 / (clip[:, 3] + PERSPECTIVE_EPS)
    ndc = clip[:, :3] * inv_w[:, None]
    wh = jnp.asarray([width, height], dtype=ndc.dtype)
    return ((ndc[:, :2] + 1.0) * wh - 1.0) / 2.0


def ewa_project_covariance(
    cov3d: jnp.ndarray,
    cam_points: jnp.ndarray,
    tan_fov_x: float,
    tan_fov_y: float,
    focal_x: float,
    focal_y: float,
    w2c_t: jnp.ndarray,
) -> jnp.ndarray:
    """EWA splatting: project 3D covariances to 2D screen space.

    Matches rasterize.py:201-252 including its quirks: the focal lengths are
    halved to compensate the Inria FoV formula's missing factor 2
    (rasterize.py:213-216), the view ray is clamped to 1.3*tan(fov)
    (rasterize.py:210-221), and a +0.3 low-pass is added to the diagonal so
    every gaussian is at least ~1px wide (rasterize.py:247-250).

    Rather than materializing [N, 3, 3] Jacobians and doing batched 3x3
    matmuls, the 2x3 nonzero structure of J is exploited: with
    ``T = J @ W`` (W the world->camera rotation), the projected covariance is
    ``T @ cov3d @ T^T`` — two batched contractions that XLA fuses well.

    Returns ``[N, 2, 2]``.
    """
    fx = focal_x / 2.0
    fy = focal_y / 2.0
    x, y, z = cam_points[:, 0], cam_points[:, 1], cam_points[:, 2]
    lim_x = EWA_TAN_CLAMP * tan_fov_x
    lim_y = EWA_TAN_CLAMP * tan_fov_y
    tx = jnp.clip(x / z, -lim_x, lim_x) * z
    ty = jnp.clip(y / z, -lim_y, lim_y) * z

    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z
    # J rows (only the nonzero entries; third row of the full 3x3 J is zero):
    #   [fx/z,    0, -fx*tx/z^2]
    #   [   0, fy/z, -fy*ty/z^2]
    zeros = jnp.zeros_like(z)
    j = jnp.stack(
        [
            jnp.stack([fx * inv_z, zeros, -fx * tx * inv_z2], axis=-1),
            jnp.stack([zeros, fy * inv_z, -fy * ty * inv_z2], axis=-1),
        ],
        axis=-2,
    )  # [N, 2, 3]
    w_rot = w2c_t[:3, :3].T  # world->camera rotation R (w2c_t holds R^T)
    t = jnp.einsum("nij,jk->nik", j, w_rot, precision="highest")  # [N, 2, 3]
    cov2d = jnp.einsum("nij,njk,nlk->nil", t, cov3d, t, precision="highest")  # T Σ T^T
    lowpass = jnp.asarray(
        [[COV2D_LOWPASS, 0.0], [0.0, COV2D_LOWPASS]], dtype=cov2d.dtype
    )
    return cov2d + lowpass


def conic_from_cov2d(cov2d: jnp.ndarray):
    """Inverse 2D covariance packed as ``[sigma_x, sigma_y, sigma_xy]``.

    Matches rasterize.py:395-411: ``det == 0`` maps to an all-zero conic
    (the raster loop then skips the gaussian). Note the reference's packing:
    sigma_x multiplies dx^2 and equals cov[1,1]/det, sigma_xy = -cov[0,1]/det.

    Returns (conic ``[N, 3]``, det ``[N]``).
    """
    a = cov2d[:, 0, 0]
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1]
    det = a * c - b * b
    det_inv = jnp.where(det == 0.0, 0.0, 1.0 / det)
    conic = jnp.stack([c * det_inv, a * det_inv, -b * det_inv], axis=-1)
    return conic, det


def covering_bbox(
    screen_means: jnp.ndarray,
    cov2d: jnp.ndarray,
    width: int,
    height: int,
) -> jnp.ndarray:
    """Integer pixel bbox ``[x_min, y_min, x_max, y_max]`` per gaussian with
    half-open coverage ``[x_min, x_max) x [y_min, y_max)``.

    Reproduces the reference's two-step rounding exactly: the bbox is first
    computed in BLOCK_SIZE=16 units with clamps to (width-1, height-1) *in
    block units* (rasterize.py:183-198 — the clamp bound is a reference quirk
    kept for parity), floored to int, then rescaled by 16 and re-clamped to
    pixels (rasterize.py:413-419). Radius is ceil(3 * max-std-dev) with the
    0.1 floor inside the sqrt (rasterize.py:163-181).
    """
    a = cov2d[:, 0, 0]
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1]
    det = a * c - b * b
    trace = a + c
    disc = jnp.maximum(trace * trace / 4.0 - det, EIGENVALUE_FLOOR)
    lambda1 = trace / 2.0 + jnp.sqrt(disc)
    lambda2 = trace / 2.0 - jnp.sqrt(disc)
    max_spread = jnp.ceil(
        GAUSSIAN_SPREAD * jnp.sqrt(jnp.maximum(lambda1, lambda2))
    )

    mx, my = screen_means[:, 0], screen_means[:, 1]
    bs = float(BLOCK_SIZE)
    x_min_b = jnp.clip((mx - max_spread) / bs, 0, width - 1)
    y_min_b = jnp.clip((my - max_spread) / bs, 0, height - 1)
    x_max_b = jnp.clip((mx + max_spread + bs - 1) / bs, 0, width - 1)
    y_max_b = jnp.clip((my + max_spread + bs - 1) / bs, 0, height - 1)
    bbox_blocks = jnp.floor(
        jnp.stack([x_min_b, y_min_b, x_max_b, y_max_b], axis=-1)
    ).astype(jnp.int32)

    x_min = jnp.clip(bbox_blocks[:, 0] * BLOCK_SIZE, 0, width - 1)
    y_min = jnp.clip(bbox_blocks[:, 1] * BLOCK_SIZE, 0, height - 1)
    x_max = jnp.clip(bbox_blocks[:, 2] * BLOCK_SIZE, 0, width - 1)
    y_max = jnp.clip(bbox_blocks[:, 3] * BLOCK_SIZE, 0, height - 1)
    return jnp.stack([x_min, y_min, x_max, y_max], axis=-1)


class Preprocessed(NamedTuple):
    """Everything the binner + rasterizer need, all ``[N, ...]``."""

    screen_means: jnp.ndarray  # [N, 2] pixel-space centers
    conics: jnp.ndarray  # [N, 3] inverse 2D covariance (sx, sy, sxy)
    rgb: jnp.ndarray  # [N, 3] view-dependent color
    opacity: jnp.ndarray  # [N] activated opacity
    depth: jnp.ndarray  # [N] camera-space z (sort key)
    bbox: jnp.ndarray  # [N, 4] int pixel bbox, half-open
    active: jnp.ndarray  # [N] bool: participates in rasterization


def preprocess_active_mask(
    bbox: jnp.ndarray, conics: jnp.ndarray, strict_parity: bool
) -> jnp.ndarray:
    """Which gaussians the raster loop would actually blend.

    The reference skips a gaussian when its bbox area is zero or *any* conic
    coefficient is exactly zero (rasterize.py:440-443). The any-zero test also
    drops perfectly axis-aligned gaussians (sigma_xy == 0) — a reference quirk
    reproduced only under ``strict_parity``; otherwise only degenerate
    (det==0 -> all-zero conic) gaussians are dropped.
    """
    area = (bbox[:, 2] - bbox[:, 0]) * (bbox[:, 3] - bbox[:, 1])
    nonzero_area = area > 0
    if strict_parity:
        conic_ok = jnp.all(conics != 0.0, axis=-1)
    else:
        conic_ok = jnp.any(conics != 0.0, axis=-1)
    return nonzero_area & conic_ok


def preprocess_gaussians(
    means: jnp.ndarray,
    cov3d: jnp.ndarray,
    opacity: jnp.ndarray,
    rgb: jnp.ndarray,
    w2c_t: jnp.ndarray,
    full_proj_t: jnp.ndarray,
    tan_fov_x: float,
    tan_fov_y: float,
    focal_x: float,
    focal_y: float,
    width: int,
    height: int,
    strict_parity: bool = True,
) -> Preprocessed:
    """Full per-gaussian preprocess for one camera (rasterize.py:370-425)."""
    cam_points = project_to_camera_space(means, w2c_t)
    depth = cam_points[:, 2]
    screen_means = project_to_screen(means, full_proj_t, depth, width, height)
    cov2d = ewa_project_covariance(
        cov3d, cam_points, tan_fov_x, tan_fov_y, focal_x, focal_y, w2c_t
    )
    # Culled gaussians get a zero covariance (rasterize.py:388) -> det == 0
    # -> zero conic -> skipped by the raster loop.
    culled = depth < FRUSTUM_NEAR_Z
    cov2d = jnp.where(culled[:, None, None], 0.0, cov2d)
    conics, _ = conic_from_cov2d(cov2d)
    bbox = covering_bbox(screen_means, cov2d, width, height)
    active = preprocess_active_mask(bbox, conics, strict_parity)
    return Preprocessed(
        screen_means=screen_means,
        conics=conics,
        rgb=rgb,
        opacity=opacity,
        depth=depth,
        bbox=bbox,
        active=active,
    )
