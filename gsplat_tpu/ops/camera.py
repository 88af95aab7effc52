"""Camera math: world->camera and perspective projection matrices.

Parity targets in the reference:
  * world->camera matrix: ``rasterize.py:59-77`` — COLMAP convention where
    ``X_cam = R @ X_world + t`` (tvec is already the world->cam translation,
    stored positive at [:3, 3] despite the docstring's ``-T``).
  * OpenGL-style perspective matrix: ``rasterize.py:123-151`` with
    Z_NEAR=0.01, Z_FAR=100, z_sign=+1 and the w=z row at P[3, 2].
  * FoV from COLMAP intrinsics: ``rasterize.py:342-343``.

Internally we keep the same row-vector convention the reference uses for its
combined transform (points are multiplied on the left: ``p @ M``), because
every test compares against it; helpers below produce the transposed
matrices directly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from gsplat_tpu.config import Z_FAR, Z_NEAR
from gsplat_tpu.ops.quaternion import quaternion_to_rotation_matrix


def world_to_camera_matrix(qvec: jnp.ndarray, tvec: jnp.ndarray) -> jnp.ndarray:
    """4x4 world->camera matrix from a unit quaternion and COLMAP tvec.

    Column-vector convention: ``X_cam = (M @ [X_world; 1])[:3]``.
    Matches reference rasterize.py:59-77.
    """
    rot = quaternion_to_rotation_matrix(qvec)
    m = jnp.zeros((4, 4), dtype=rot.dtype)
    m = m.at[:3, :3].set(rot)
    m = m.at[:3, 3].set(tvec)
    m = m.at[3, 3].set(1.0)
    return m


def projection_matrix(fov_x: float, fov_y: float) -> jnp.ndarray:
    """OpenGL-style perspective matrix (column-vector convention).

    Matches reference rasterize.py:123-151: symmetric frustum from the full
    fields of view, depth mapped with ``P[2,2]=zf/(zf-zn)``,
    ``P[2,3]=-zf*zn/(zf-zn)`` and homogeneous w = +z (``P[3,2]=1``).
    """
    tan_half_x = jnp.tan(fov_x / 2.0)
    tan_half_y = jnp.tan(fov_y / 2.0)
    top = tan_half_y * Z_NEAR
    right = tan_half_x * Z_NEAR
    p = jnp.zeros((4, 4), dtype=jnp.result_type(tan_half_x, jnp.float32))
    p = p.at[0, 0].set(2.0 * Z_NEAR / (2.0 * right))
    p = p.at[1, 1].set(2.0 * Z_NEAR / (2.0 * top))
    # Symmetric frustum: (right+left)=0 and (top+bottom)=0, so P[0,2]=P[1,2]=0.
    p = p.at[2, 2].set(Z_FAR / (Z_FAR - Z_NEAR))
    p = p.at[2, 3].set(-(Z_FAR * Z_NEAR) / (Z_FAR - Z_NEAR))
    p = p.at[3, 2].set(1.0)
    return p


def fov_from_focal(width: float, height: float, fx: float, fy: float) -> Tuple[float, float]:
    """Full fields of view from pinhole intrinsics (rasterize.py:342-343)."""
    fov_x = 2.0 * math.atan(width / (2.0 * fx))
    fov_y = 2.0 * math.atan(height / (2.0 * fy))
    return fov_x, fov_y


@dataclasses.dataclass(frozen=True)
class CameraParams:
    """Everything the renderer needs about one camera/view.

    ``width``/``height`` are the *render* resolution (the reference takes
    them from the scale-factor-downsampled GT image, rasterize.py:333-338,
    while the FoV always comes from the full-resolution intrinsics).
    """

    width: int
    height: int
    fov_x: float
    fov_y: float
    focal_x: float
    focal_y: float
    qvec: Tuple[float, float, float, float]
    tvec: Tuple[float, float, float]

    @property
    def tan_fov_x(self) -> float:
        return math.tan(self.fov_x * 0.5)

    @property
    def tan_fov_y(self) -> float:
        return math.tan(self.fov_y * 0.5)

    def matrices(self, dtype=jnp.float32):
        """Return (world_to_camera^T, full_projection^T) as used by the
        row-vector pipeline: ``clip = p @ full_proj_t`` (rasterize.py:361-364).
        """
        w2c = world_to_camera_matrix(
            jnp.asarray(self.qvec, dtype), jnp.asarray(self.tvec, dtype)
        )
        proj = projection_matrix(
            jnp.asarray(self.fov_x, dtype), jnp.asarray(self.fov_y, dtype)
        )
        w2c_t = w2c.T
        full_proj_t = jnp.matmul(w2c_t, proj.T, precision="highest")
        return w2c_t.astype(dtype), full_proj_t.astype(dtype)

    @staticmethod
    def from_colmap(image, camera, render_width: int, render_height: int) -> "CameraParams":
        """Build from COLMAP ``BaseImage`` + ``Camera`` records.

        The reference hardcodes camera id 1 and takes fx, fy from
        ``params[0:2]`` (rasterize.py:336-343) — correct only for PINHOLE.
        Single-focal models (SIMPLE_PINHOLE / SIMPLE_RADIAL / RADIAL /
        SIMPLE_RADIAL_FISHEYE / RADIAL_FISHEYE) store (f, cx, cy, ...), so
        fx = fy = params[0]; two-focal models (PINHOLE, OPENCV*, FOV, ...)
        store (fx, fy, cx, cy, ...). Distortion coefficients are ignored
        (the splatting pipeline, like the reference, assumes an undistorted
        pinhole projection).
        """
        single_focal = getattr(camera, "model", "PINHOLE") in {
            "SIMPLE_PINHOLE", "SIMPLE_RADIAL", "RADIAL",
            "SIMPLE_RADIAL_FISHEYE", "RADIAL_FISHEYE",
        }
        fx = float(camera.params[0])
        fy = fx if single_focal else float(camera.params[1])
        fov_x, fov_y = fov_from_focal(camera.width, camera.height, fx, fy)
        return CameraParams(
            width=int(render_width),
            height=int(render_height),
            fov_x=fov_x,
            fov_y=fov_y,
            focal_x=fx,
            focal_y=fy,
            qvec=tuple(np.asarray(image.qvec, dtype=np.float64).tolist()),
            tvec=tuple(np.asarray(image.tvec, dtype=np.float64).tolist()),
        )


class CameraArrays(NamedTuple):
    """Traced per-view camera quantities (a pytree, unlike CameraParams).

    Use this form wherever cameras are data rather than configuration:
    batched/video rendering (vmap/lax.map over stacked leaves), shard_map
    train steps, and anywhere a camera must cross a jit boundary without
    retracing. Width/height stay static (they fix array shapes).
    """

    w2c_t: jnp.ndarray  # [4, 4]
    full_proj_t: jnp.ndarray  # [4, 4]
    cam_center: jnp.ndarray  # [3]
    tan_fov: jnp.ndarray  # [2] (tan of half fov x, y)
    focal: jnp.ndarray  # [2] (fx, fy)

    @staticmethod
    def from_params(camera: "CameraParams", dtype=jnp.float32) -> "CameraArrays":
        w2c_t, full_proj_t = camera.matrices(dtype)
        return CameraArrays(
            w2c_t=w2c_t,
            full_proj_t=full_proj_t,
            cam_center=camera_center(w2c_t),
            tan_fov=jnp.asarray([camera.tan_fov_x, camera.tan_fov_y], dtype),
            focal=jnp.asarray([camera.focal_x, camera.focal_y], dtype),
        )

    @staticmethod
    def stack(cameras) -> "CameraArrays":
        """Stack a sequence of CameraArrays into batched leaves [B, ...]."""
        import jax

        return jax.tree.map(lambda *xs: jnp.stack(xs), *cameras)


def camera_center(world_to_camera_t: jnp.ndarray) -> jnp.ndarray:
    """World-space camera position from the transposed world->camera matrix.

    Equals ``inverse(w2c_t)[3, :3]`` (spherical_harmonics.py:35) which is
    ``-R^T @ t`` in column-vector terms; computed directly for stability.
    """
    rot_t = world_to_camera_t[:3, :3]  # this is R^T
    t = world_to_camera_t[3, :3]
    return -(rot_t @ t)
