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
    bbox: jnp.ndarray  # [N, 4] int pixel bbox, half-open (reference-exact;
    #   the rasterizer's containment test uses THIS rect)
    cull_bbox: jnp.ndarray  # [N, 4] int pixel rect for tile binning only:
    #   bbox intersected with the opacity-aware alpha-bound rect (pixels
    #   outside it provably fail the reference's alpha > 1/255 gate, so
    #   dropping whole tiles outside it cannot change the image)
    active: jnp.ndarray  # [N] bool: participates in rasterization


def _alpha_cull_bbox(
    mean_px, mean_py, cov_a, cov_c, opacity, bbox, width: int, height: int
):
    """Tile-cull rect: the reference composites a pixel only when
    ``alpha = opac * exp(density) > 1/255`` (rasterize.py:291). Minimizing
    the quadratic form over one axis gives ``density <= -dx^2 / (2*Sigma_xx)``,
    so every pixel with ``|dx| > sqrt(2*Sigma_xx*ln(255*opac))`` fails the
    gate regardless of dy (same for y with Sigma_yy). Intersecting the
    reference bbox with this rect (plus a 1px guard for f32 rounding at the
    gate threshold) is therefore exactness-preserving — it only removes
    (gaussian, tile) pairs whose every pixel contributes exactly zero."""
    log_gate = jnp.log(jnp.maximum(opacity, 1e-30) * 255.0)
    live = log_gate > 0.0  # opac <= 1/255 never passes the gate at all
    guard = 1.0
    rx = jnp.sqrt(2.0 * jnp.maximum(cov_a, 0.0) * jnp.maximum(log_gate, 0.0)) + guard
    ry = jnp.sqrt(2.0 * jnp.maximum(cov_c, 0.0) * jnp.maximum(log_gate, 0.0)) + guard

    # Clamp the float rect to the screen BEFORE the int cast: a huge/inf
    # radius would saturate the cast at INT32_MAX and the +1 would wrap
    # negative, silently deleting a visible splat.
    def lo(v):
        return jnp.clip(v, -1.0, float(width + height)).astype(jnp.int32)

    cx_min = jnp.maximum(bbox[:, 0], lo(jnp.ceil(mean_px - rx)))
    cy_min = jnp.maximum(bbox[:, 1], lo(jnp.ceil(mean_py - ry)))
    cx_max = jnp.minimum(bbox[:, 2], lo(jnp.floor(mean_px + rx)) + 1)
    cy_max = jnp.minimum(bbox[:, 3], lo(jnp.floor(mean_py + ry)) + 1)
    cx_max = jnp.where(live, cx_max, cx_min)  # empty rect => zero tiles
    cy_max = jnp.where(live, cy_max, cy_min)
    return jnp.stack([cx_min, cy_min, cx_max, cy_max], axis=-1)


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


def preprocess_gaussians_from_params(
    means: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacity: jnp.ndarray,
    rgb: jnp.ndarray,
    w2c_t: jnp.ndarray,
    full_proj_t: jnp.ndarray,
    tan_fov_x,
    tan_fov_y,
    focal_x,
    focal_y,
    width: int,
    height: int,
    strict_parity: bool = True,
    screen_offset: jnp.ndarray | None = None,
) -> Preprocessed:
    """Struct-of-arrays preprocess straight from raw activated parameters.

    ``screen_offset`` ([N, 2], normally all-zero) is added to the pixel-space
    means; differentiating the render with respect to it yields the exact
    *viewspace* positional gradient the 3DGS densification heuristic keys on
    (train/densify.py) without re-deriving it from world-space grads.

    Mathematically identical to :func:`preprocess_gaussians` (same reference
    parity, rasterize.py:370-425), but every intermediate is a flat ``[N]``
    column. The AoS form materializes ``[N,3,3]`` / ``[N,2,3]`` / ``[N,2,2]``
    arrays whose tiny minor dims get padded to whole (8,128) TPU tiles — a
    ~100x HBM blowup per intermediate that made the preprocess (and its
    autodiff transpose in the training step) bandwidth-bound. Here the 3x3
    algebra is unrolled into scalar-coefficient column arithmetic, which XLA
    fuses into a single dense elementwise pass.
    """
    f = means.dtype
    x, y, z = means[:, 0], means[:, 1], means[:, 2]
    sx, sy, sz = scales[:, 0], scales[:, 1], scales[:, 2]

    # -- rotation columns from normalized quaternions (rasterize.py:41-56,
    #    norm clamped at 1e-12 as torch's F.normalize does, :112) --
    qw, qx, qy, qz = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    inv_n = 1.0 / jnp.maximum(
        jnp.sqrt(qw * qw + qx * qx + qy * qy + qz * qz), 1e-12
    )
    qw, qx, qy, qz = qw * inv_n, qx * inv_n, qy * inv_n, qz * inv_n
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qz * qw)
    r02 = 2 * (qx * qz + qy * qw)
    r10 = 2 * (qx * qy + qz * qw)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qx * qw)
    r20 = 2 * (qx * qz - qy * qw)
    r21 = 2 * (qy * qz + qx * qw)
    r22 = 1 - 2 * (qx * qx + qy * qy)

    # -- 3D covariance components: Cov = (R S)(R S)^T (rasterize.py:89-120),
    #    m_aj = r_aj * s_j, c_ab = sum_j m_aj * m_bj --
    m00, m01, m02 = r00 * sx, r01 * sy, r02 * sz
    m10, m11, m12 = r10 * sx, r11 * sy, r12 * sz
    m20, m21, m22 = r20 * sx, r21 * sy, r22 * sz
    c00 = m00 * m00 + m01 * m01 + m02 * m02
    c01 = m00 * m10 + m01 * m11 + m02 * m12
    c02 = m00 * m20 + m01 * m21 + m02 * m22
    c11 = m10 * m10 + m11 * m11 + m12 * m12
    c12 = m10 * m20 + m11 * m21 + m12 * m22
    c22 = m20 * m20 + m21 * m21 + m22 * m22

    # -- camera space + depth (rasterize.py:80-86; row-vector convention) --
    cam_x = x * w2c_t[0, 0] + y * w2c_t[1, 0] + z * w2c_t[2, 0] + w2c_t[3, 0]
    cam_y = x * w2c_t[0, 1] + y * w2c_t[1, 1] + z * w2c_t[2, 1] + w2c_t[3, 1]
    depth = x * w2c_t[0, 2] + y * w2c_t[1, 2] + z * w2c_t[2, 2] + w2c_t[3, 2]
    culled = depth < FRUSTUM_NEAR_Z

    # -- clip/NDC/pixel projection (rasterize.py:374-391) --
    def proj_col(j):
        return (
            x * full_proj_t[0, j]
            + y * full_proj_t[1, j]
            + z * full_proj_t[2, j]
            + full_proj_t[3, j]
        )

    zero = jnp.zeros_like(x)
    clip_x = jnp.where(culled, zero, proj_col(0))
    clip_y = jnp.where(culled, zero, proj_col(1))
    clip_w = jnp.where(culled, zero, proj_col(3))
    inv_w = 1.0 / (clip_w + PERSPECTIVE_EPS)
    mean_px = ((clip_x * inv_w + 1.0) * width - 1.0) / 2.0
    mean_py = ((clip_y * inv_w + 1.0) * height - 1.0) / 2.0
    if screen_offset is not None:
        mean_px = mean_px + screen_offset[:, 0]
        mean_py = mean_py + screen_offset[:, 1]

    # -- EWA projection (rasterize.py:201-252): J has two nonzero rows;
    #    T = J W with W = w2c rotation, i.e. W[k, j] = w2c_t[j, k] --
    fx = focal_x / 2.0
    fy = focal_y / 2.0
    lim_x = EWA_TAN_CLAMP * tan_fov_x
    lim_y = EWA_TAN_CLAMP * tan_fov_y
    inv_z = 1.0 / depth
    tx_c = jnp.clip(cam_x * inv_z, -lim_x, lim_x) * depth
    ty_c = jnp.clip(cam_y * inv_z, -lim_y, lim_y) * depth
    j00 = fx * inv_z
    j02 = -fx * tx_c * inv_z * inv_z
    j11 = fy * inv_z
    j12 = -fy * ty_c * inv_z * inv_z
    t00 = j00 * w2c_t[0, 0] + j02 * w2c_t[0, 2]
    t01 = j00 * w2c_t[1, 0] + j02 * w2c_t[1, 2]
    t02 = j00 * w2c_t[2, 0] + j02 * w2c_t[2, 2]
    t10 = j11 * w2c_t[0, 1] + j12 * w2c_t[0, 2]
    t11 = j11 * w2c_t[1, 1] + j12 * w2c_t[1, 2]
    t12 = j11 * w2c_t[2, 1] + j12 * w2c_t[2, 2]
    # u_a = t_a . Sigma ; cov2d_ab = u_a . t_b  (Sigma symmetric)
    u00 = t00 * c00 + t01 * c01 + t02 * c02
    u01 = t00 * c01 + t01 * c11 + t02 * c12
    u02 = t00 * c02 + t01 * c12 + t02 * c22
    u10 = t10 * c00 + t11 * c01 + t12 * c02
    u11 = t10 * c01 + t11 * c11 + t12 * c12
    u12 = t10 * c02 + t11 * c12 + t12 * c22
    cov_a = u00 * t00 + u01 * t01 + u02 * t02 + COV2D_LOWPASS
    cov_b = u00 * t10 + u01 * t11 + u02 * t12
    cov_c = u10 * t10 + u11 * t11 + u12 * t12 + COV2D_LOWPASS
    # Culled gaussians get a zero covariance (rasterize.py:388) -> det == 0
    # -> zero conic -> skipped by the raster loop.
    cov_a = jnp.where(culled, zero, cov_a)
    cov_b = jnp.where(culled, zero, cov_b)
    cov_c = jnp.where(culled, zero, cov_c)

    # -- conic (rasterize.py:395-411) --
    det = cov_a * cov_c - cov_b * cov_b
    det_inv = jnp.where(det == 0.0, zero, 1.0 / det)
    conic_x = cov_c * det_inv
    conic_y = cov_a * det_inv
    conic_xy = -cov_b * det_inv

    # -- covering bbox (rasterize.py:154-198, 413-419) --
    trace = cov_a + cov_c
    disc = jnp.maximum(trace * trace / 4.0 - det, EIGENVALUE_FLOOR)
    sq = jnp.sqrt(disc)
    max_spread = jnp.ceil(
        GAUSSIAN_SPREAD * jnp.sqrt(jnp.maximum(trace / 2.0 + sq, trace / 2.0 - sq))
    )
    bs = float(BLOCK_SIZE)
    x_min = jnp.floor(jnp.clip((mean_px - max_spread) / bs, 0, width - 1))
    y_min = jnp.floor(jnp.clip((mean_py - max_spread) / bs, 0, height - 1))
    x_max = jnp.floor(jnp.clip((mean_px + max_spread + bs - 1) / bs, 0, width - 1))
    y_max = jnp.floor(jnp.clip((mean_py + max_spread + bs - 1) / bs, 0, height - 1))
    x_min = jnp.clip(x_min.astype(jnp.int32) * BLOCK_SIZE, 0, width - 1)
    y_min = jnp.clip(y_min.astype(jnp.int32) * BLOCK_SIZE, 0, height - 1)
    x_max = jnp.clip(x_max.astype(jnp.int32) * BLOCK_SIZE, 0, width - 1)
    y_max = jnp.clip(y_max.astype(jnp.int32) * BLOCK_SIZE, 0, height - 1)

    area = (x_max - x_min) * (y_max - y_min)
    if strict_parity:
        conic_ok = (conic_x != 0.0) & (conic_y != 0.0) & (conic_xy != 0.0)
    else:
        conic_ok = (conic_x != 0.0) | (conic_y != 0.0) | (conic_xy != 0.0)
    active = (area > 0) & conic_ok

    bbox = jnp.stack([x_min, y_min, x_max, y_max], axis=-1)
    return Preprocessed(
        screen_means=jnp.stack([mean_px, mean_py], axis=-1),
        conics=jnp.stack([conic_x, conic_y, conic_xy], axis=-1),
        rgb=rgb,
        opacity=opacity,
        depth=depth,
        bbox=bbox,
        cull_bbox=_alpha_cull_bbox(
            mean_px, mean_py, cov_a, cov_c, opacity, bbox, width, height
        ),
        active=active,
    )


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
        cull_bbox=_alpha_cull_bbox(
            screen_means[:, 0], screen_means[:, 1],
            cov2d[:, 0, 0], cov2d[:, 1, 1], opacity, bbox, width, height,
        ),
        active=active,
    )
