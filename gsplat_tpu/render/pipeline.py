"""End-to-end render pipeline.

Mirrors the reference driver's compute sequence (rasterize.py:353-452) as a
single jitted function: activations -> camera matrices -> SH color ->
projection/EWA preprocess -> tile binning -> tile rasterization -> image
assembly. Two camera forms:

  * :func:`render` takes a static :class:`CameraParams` (one compile per
    camera pose — fine for interactive use);
  * :func:`render_traced` takes a :class:`CameraArrays` pytree, so camera
    pose is *data*: one compile serves every pose. :func:`render_batch`
    maps it over a stacked batch (the camera-orbit video workload).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from gsplat_tpu.config import RasterConfig
from gsplat_tpu.kernels.raster import _use_pallas, rasterize_tiles
from gsplat_tpu.models.gaussians import GaussianModel
from gsplat_tpu.ops import binning
from gsplat_tpu.ops.camera import CameraArrays, CameraParams
from gsplat_tpu.ops.compositing import render_oracle
from gsplat_tpu.ops.projection import Preprocessed, preprocess_gaussians_from_params
from gsplat_tpu.ops.sh import sh_to_rgb
from gsplat_tpu.render.tile_jnp import tiles_to_image


def preprocess_traced(
    model: GaussianModel,
    cam: CameraArrays,
    width: int,
    height: int,
    cfg: RasterConfig,
    screen_offset=None,
) -> Preprocessed:
    """Per-gaussian preprocess for one (traced) camera (rasterize.py:353-425).

    ``screen_offset``: optional [N, 2] viewspace-gradient probe
    (ops/projection.py; used by the densifying trainer)."""
    rgb = sh_to_rgb(model.means, model.sh, cam.cam_center, degree=cfg.sh_degree)
    return preprocess_gaussians_from_params(
        means=model.means,
        scales=model.scales(),
        quats=model.quats,
        opacity=model.opacity(),
        rgb=rgb,
        w2c_t=cam.w2c_t,
        full_proj_t=cam.full_proj_t,
        tan_fov_x=cam.tan_fov[0],
        tan_fov_y=cam.tan_fov[1],
        focal_x=cam.focal[0],
        focal_y=cam.focal[1],
        width=width,
        height=height,
        strict_parity=cfg.strict_parity,
        screen_offset=screen_offset,
    )


def preprocess(
    model: GaussianModel, camera: CameraParams, cfg: RasterConfig
) -> Preprocessed:
    return preprocess_traced(
        model,
        CameraArrays.from_params(camera, dtype=model.means.dtype),
        camera.width,
        camera.height,
        cfg,
    )


@partial(jax.jit, static_argnames=("width", "height", "cfg"))
def render_traced(
    model: GaussianModel,
    cam: CameraArrays,
    width: int,
    height: int,
    cfg: RasterConfig = RasterConfig(),
    screen_offset=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render one view from traced camera arrays.

    Returns (image [H, W, 3], transmittance [H, W]). ``screen_offset``
    ([N, 2], optional) shifts pixel-space means — the densifying trainer
    differentiates w.r.t. an all-zero offset to read viewspace gradients.
    """
    prep = preprocess_traced(model, cam, width, height, cfg, screen_offset)
    if _use_pallas(cfg) and cfg.slice_pairs > 0:
        # Depth-sliced lazy binning: P-scale sort work tracks composited
        # pairs, not total demand (render/sliced.py); features stay in
        # original id order (the standard pack).
        from gsplat_tpu.render.sliced import render_sliced_tiles

        feat = binning.pack_features(prep).astype(jnp.float32)
        color, trans = render_sliced_tiles(prep, feat, width, height, cfg)
        return (
            tiles_to_image(color, width, height, cfg.tile_size),
            tiles_to_image(trans, width, height, cfg.tile_size),
        )
    feat = binning.pack_features(prep)
    if _use_pallas(cfg):
        # Fused path: the 13 feature columns ride the pair sort, so binning
        # emits the kernels' dense pair slab directly — no post-sort P-row
        # gather. stop_gradient + int32 bitcast: the slab is a pure
        # re-layout of feat rows whose gradient the rasterizer's reduction
        # already routes through d_feat (kernels/raster.py).
        bins, pair_feat = binning.bin_gaussians(
            prep, width, height, cfg.tile_size, cfg.max_pairs,
            align=cfg.pair_block,
            feat_rows=jax.lax.stop_gradient(feat[:-1]),
        )
        pair_feat_i32 = jax.lax.bitcast_convert_type(pair_feat, jnp.int32)
    else:
        bins = binning.bin_gaussians(
            prep, width, height, cfg.tile_size, cfg.max_pairs,
            align=cfg.pair_block,
        )
        pair_feat_i32 = None
    n_tiles_x = -(-width // cfg.tile_size)
    n_tiles_y = -(-height // cfg.tile_size)
    tile_ids = jnp.arange(n_tiles_x * n_tiles_y, dtype=jnp.int32)
    color, trans = rasterize_tiles(
        feat, bins.pair_gaussian, bins.tile_start, bins.tile_count,
        tile_ids, bins.gaussian_counts, n_tiles_x, cfg,
        pair_feat_i32=pair_feat_i32, width=width, height=height,
    )
    return (
        tiles_to_image(color, width, height, cfg.tile_size),
        tiles_to_image(trans, width, height, cfg.tile_size),
    )


@partial(jax.jit, static_argnames=("camera", "cfg"))
def render(
    model: GaussianModel, camera: CameraParams, cfg: RasterConfig = RasterConfig()
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render one view. Returns (image [H, W, 3], transmittance [H, W])."""
    cam = CameraArrays.from_params(camera, dtype=model.means.dtype)
    return render_traced(model, cam, camera.width, camera.height, cfg)


@partial(jax.jit, static_argnames=("width", "height", "cfg"))
def render_batch(
    model: GaussianModel,
    cams: CameraArrays,
    width: int,
    height: int,
    cfg: RasterConfig = RasterConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render a batch of views (stacked CameraArrays leaves, [B, ...]).

    Sequential over cameras (lax.map) — each frame already fills the chip;
    batching across frames is done with the mesh "data" axis instead
    (gsplat_tpu.parallel). Returns ([B, H, W, 3], [B, H, W]).
    """
    return jax.lax.map(
        lambda c: render_traced(model, c, width, height, cfg), cams
    )


@partial(jax.jit, static_argnames=("width", "height", "cfg"))
def binning_stats(
    model: GaussianModel,
    cam: CameraArrays,
    width: int,
    height: int,
    cfg: RasterConfig = RasterConfig(),
) -> dict:
    """Pair-budget diagnostics for one view.

    ``overflowed`` means the fixed pair buffer could not hold the view's
    demand and the deepest splats were dropped (ops/binning.py overflow
    policy) — re-render with a larger ``cfg.max_pairs``.
    See :func:`suggest_max_pairs`.
    """
    prep = preprocess_traced(model, cam, width, height, cfg)
    bins = binning.bin_gaussians(
        prep, width, height, cfg.tile_size, cfg.max_pairs, align=cfg.pair_block
    )
    return {
        "num_pairs": bins.num_pairs,
        "pair_demand": bins.pair_demand,
        "capacity": jnp.int32(cfg.max_pairs),
        "overflowed": bins.pair_demand > cfg.max_pairs,
        "active_gaussians": jnp.sum(prep.active.astype(jnp.int32)),
        "max_tile_count": jnp.max(bins.tile_count),
    }


def required_max_pairs(demand: int, headroom: float = 1.5, floor: int = 32) -> int:
    """The pair capacity covering ``demand * headroom``, rounded up to a
    power of two (a fresh capacity changes the jit cache key, so callers
    size once per scene). The single sizing policy shared by
    :func:`suggest_max_pairs`, the trainer's auto-resize and the CLI's
    ``--auto-pairs``."""
    target = int(max(demand, 1) * headroom)
    return 1 << max(target - 1, floor).bit_length()


def suggest_max_pairs(
    model: GaussianModel,
    camera: CameraParams,
    cfg: RasterConfig = RasterConfig(),
    headroom: float = 2.0,
) -> int:
    """Size ``max_pairs`` for a scene+view: measured pair demand times
    ``headroom``, power-of-two rounded (see :func:`required_max_pairs`)."""
    cam = CameraArrays.from_params(camera, dtype=model.means.dtype)
    stats = binning_stats(model, cam, camera.width, camera.height, cfg)
    return required_max_pairs(
        int(stats["pair_demand"]), headroom, floor=cfg.pair_block
    )


@partial(jax.jit, static_argnames=("width", "height", "cfg", "near", "far"))
def render_depth(
    model: GaussianModel,
    cam: CameraArrays,
    width: int,
    height: int,
    cfg: RasterConfig = RasterConfig(),
    near: float = 0.2,
    far: float = 100.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expected-depth map: alpha-composite each gaussian's camera-space z
    through the standard pipeline (depth rides the color channel, so this
    needs no kernel changes and is differentiable like :func:`render`).

    Returns (depth [H, W], transmittance [H, W]): ``depth`` is the
    T-weighted expected camera depth in [near, far] units; pixels the
    splats never cover carry depth 0 and transmittance 1 — divide by
    ``(1 - trans)`` for an occupancy-normalized map.
    """
    z = (
        model.means[:, 0] * cam.w2c_t[0, 2]
        + model.means[:, 1] * cam.w2c_t[1, 2]
        + model.means[:, 2] * cam.w2c_t[2, 2]
        + cam.w2c_t[3, 2]
    )
    depth_norm = jnp.clip((z - near) / (far - near), 0.0, 1.0)
    # Encode depth as the degree-0 SH channel: sh_to_rgb computes
    # C0*sh0 + 0.5 then clamps to [0,1], so sh0 = (d - 0.5)/C0 round-trips
    # exactly for d in [0,1] (ops/sh.py).
    from gsplat_tpu.ops.sh import SH_C0

    sh = jnp.zeros_like(model.sh)
    sh = sh.at[:, 0, :].set(((depth_norm - 0.5) / SH_C0)[:, None])
    depth_model = GaussianModel(
        means=model.means,
        log_scales=model.log_scales,
        quats=model.quats,
        opacity_logits=model.opacity_logits,
        sh=sh,
    )
    dcfg = dataclasses.replace(cfg, sh_degree=0)
    img, trans = render_traced(depth_model, cam, width, height, dcfg)
    return img[:, :, 0] * (far - near) + near * (1.0 - trans), trans


@partial(jax.jit, static_argnames=("camera", "cfg"))
def render_reference_oracle(
    model: GaussianModel, camera: CameraParams, cfg: RasterConfig = RasterConfig()
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slow exact-semantics sequential render (test oracle; O(N*H*W))."""
    prep = preprocess(model, camera, cfg)
    return render_oracle(prep, camera.width, camera.height)
