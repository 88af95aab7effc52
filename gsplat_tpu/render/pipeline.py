"""End-to-end single-view render pipeline.

Mirrors the reference driver's compute sequence (rasterize.py:353-452) as a
single jitted function: activations -> camera matrices -> SH color ->
projection/EWA preprocess -> tile binning -> tile rasterization.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gsplat_tpu.config import RasterConfig
from gsplat_tpu.models.gaussians import GaussianModel
from gsplat_tpu.ops import binning
from gsplat_tpu.ops.camera import CameraParams, camera_center
from gsplat_tpu.ops.compositing import render_oracle
from gsplat_tpu.ops.projection import Preprocessed, preprocess_gaussians
from gsplat_tpu.ops.sh import sh_to_rgb


class RenderInputs(NamedTuple):
    """Traced per-view quantities derived from a CameraParams (static)."""

    w2c_t: jnp.ndarray
    full_proj_t: jnp.ndarray


def preprocess(
    model: GaussianModel, camera: CameraParams, cfg: RasterConfig
) -> Preprocessed:
    """Per-gaussian preprocess for one camera (rasterize.py:353-425)."""
    w2c_t, full_proj_t = camera.matrices(dtype=model.means.dtype)
    rgb = sh_to_rgb(model.means, model.sh, camera_center(w2c_t), degree=cfg.sh_degree)
    return preprocess_gaussians(
        means=model.means,
        cov3d=model.covariances(),
        opacity=model.opacity(),
        rgb=rgb,
        w2c_t=w2c_t,
        full_proj_t=full_proj_t,
        tan_fov_x=camera.tan_fov_x,
        tan_fov_y=camera.tan_fov_y,
        focal_x=camera.focal_x,
        focal_y=camera.focal_y,
        width=camera.width,
        height=camera.height,
        strict_parity=cfg.strict_parity,
    )


@partial(jax.jit, static_argnames=("camera", "cfg"))
def render(
    model: GaussianModel, camera: CameraParams, cfg: RasterConfig = RasterConfig()
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render one view. Returns (image [H, W, 3], transmittance [H, W])."""
    prep = preprocess(model, camera, cfg)
    bins = binning.bin_gaussians(
        prep,
        camera.width,
        camera.height,
        cfg.tile_size,
        cfg.max_pairs,
        align=cfg.chunk_size,
    )
    feat = binning.pack_features(prep)
    from gsplat_tpu.kernels.raster import rasterize_pairs

    return rasterize_pairs(
        feat,
        bins.pair_gaussian,
        bins.tile_start,
        bins.tile_count,
        width=camera.width,
        height=camera.height,
        cfg=cfg,
    )


@partial(jax.jit, static_argnames=("camera", "cfg"))
def render_reference_oracle(
    model: GaussianModel, camera: CameraParams, cfg: RasterConfig = RasterConfig()
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slow exact-semantics render (test oracle; O(N*H*W))."""
    prep = preprocess(model, camera, cfg)
    return render_oracle(prep, camera.width, camera.height)
