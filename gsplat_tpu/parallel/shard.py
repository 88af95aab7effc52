"""shard_map-based multi-chip rendering and training.

Sharding layout (SURVEY.md §5.7-5.8, BASELINE.json config 5):
  * splat parameters: replicated on every device;
  * framebuffer tiles: sharded over the ``tile`` mesh axis — each device
    rasterizes its slab of tiles (front-to-back compositing stays local to a
    tile, so the forward needs zero cross-device communication);
  * camera batch: sharded over the ``data`` axis;
  * parameter gradients: one ``psum`` over both axes in the backward (the
    shard_map transpose inserts it for replicated inputs), overlappable by
    XLA with the backward tile sweep.

Per-tile load imbalance is mitigated by round-robin tile->device assignment
(device d takes tiles d, d+tp, d+2*tp, ... — neighbouring tiles have
correlated gaussian load, so striding decorrelates shard cost).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gsplat_tpu.config import RasterConfig, TrainConfig
from gsplat_tpu.kernels.raster import rasterize_tiles
from gsplat_tpu.models.gaussians import GaussianModel
from gsplat_tpu.ops import binning
from gsplat_tpu.ops.camera import CameraArrays
from gsplat_tpu.parallel.mesh import DATA_AXIS, TILE_AXIS
from gsplat_tpu.render.pipeline import preprocess_traced
from gsplat_tpu.render.tile_jnp import image_to_tiles, tiles_to_image
from gsplat_tpu.train.loss import rgb_loss
from gsplat_tpu.train.trainer import make_optimizer


def _tile_layout(width: int, height: int, tile_size: int, tp: int):
    """Static tile bookkeeping: (n_tiles_x, num_tiles, padded_tiles, order).

    ``order`` is the round-robin permutation: device d gets tiles
    d, d+tp, 2*tp+d, ... Padding slots carry id >= num_tiles, render empty,
    and are dropped at re-assembly.
    """
    n_tiles_x = -(-width // tile_size)
    n_tiles_y = -(-height // tile_size)
    num_tiles = n_tiles_x * n_tiles_y
    padded = -(-num_tiles // tp) * tp
    ids = np.arange(padded)
    order = ids.reshape(-1, tp).T.reshape(-1)  # round-robin striding
    return n_tiles_x, num_tiles, padded, order


def _bin_for_camera(model, cam, width, height, cfg):
    prep = preprocess_traced(model, cam, width, height, cfg)
    bins = binning.bin_gaussians(
        prep, width, height, cfg.tile_size, cfg.max_pairs, align=cfg.chunk_size
    )
    feat = binning.pack_features(prep)
    return feat, bins


def _gather_shard_inputs(bins, order_l, num_tiles):
    """Per-shard (starts, counts) for global tile ids, zeroing padding slots."""
    in_range = order_l < num_tiles
    safe = jnp.where(in_range, order_l, 0)
    starts = jnp.where(in_range, bins.tile_start[safe], 0)
    counts = jnp.where(in_range, bins.tile_count[safe], 0)
    return starts, counts


def _unpermute(tiles, order_l, padded, num_tiles):
    """Undo the round-robin permutation and drop padding tiles."""
    inv = jnp.zeros((padded,), jnp.int32).at[order_l].set(
        jnp.arange(padded, dtype=jnp.int32)
    )
    return tiles[inv][:num_tiles]


def make_sharded_render(
    mesh: Mesh, width: int, height: int, cfg: RasterConfig
) -> Callable[[GaussianModel, CameraArrays], Tuple[jnp.ndarray, jnp.ndarray]]:
    """Tile-sharded single-view render: returns fn(model, cam) -> (image, T).

    Preprocess + binning run replicated (they are O(N) and cheap next to the
    raster); the raster is shard_mapped over the ``tile`` axis.
    """
    tp = mesh.shape[TILE_AXIS]
    n_tiles_x, num_tiles, padded, order = _tile_layout(width, height, cfg.tile_size, tp)
    order_j = jnp.asarray(order, jnp.int32)
    if tp > 1:
        # Each shard rasterizes an interleaved tile subset; the default
        # sort-based gradient reduction assumes whole-frame coverage, so
        # force the interval-masked exact reduction (kernels/raster_bwd.py).
        cfg = dataclasses.replace(cfg, exact_grad_reduction=True)

    def raster_shard(feat, pair_gaussian, tile_start, tile_count, tile_ids, gaussian_counts):
        return rasterize_tiles(
            feat, pair_gaussian, tile_start, tile_count, tile_ids,
            gaussian_counts, n_tiles_x, cfg,
        )

    sharded_raster = jax.shard_map(
        raster_shard,
        mesh=mesh,
        in_specs=(P(), P(), P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS), P()),
        out_specs=(P(TILE_AXIS), P(TILE_AXIS)),
        check_vma=False,  # loop carries start mesh-invariant, become varying
    )

    @jax.jit
    def render_fn(model: GaussianModel, cam: CameraArrays):
        feat, bins = _bin_for_camera(model, cam, width, height, cfg)
        starts, counts = _gather_shard_inputs(bins, order_j, num_tiles)
        color, trans = sharded_raster(
            feat, bins.pair_gaussian, starts, counts, order_j, bins.gaussian_counts
        )
        color = _unpermute(color, order_j, padded, num_tiles)
        trans = _unpermute(trans, order_j, padded, num_tiles)
        return (
            tiles_to_image(color, width, height, cfg.tile_size),
            tiles_to_image(trans, width, height, cfg.tile_size),
        )

    return render_fn


def make_parallel_train_step(
    mesh: Mesh,
    width: int,
    height: int,
    raster_cfg: RasterConfig,
    train_cfg: TrainConfig,
):
    """Build a (data x tile)-parallel train step.

    Returns (train_step, init_state, prepare_targets):
      * ``train_step(model, opt_state, cams, targets_tiles)`` consumes a
        camera batch (stacked CameraArrays, leaves [B, ...]; B divisible by
        the data axis) and pre-tiled targets [B, padded_tiles, npix, 3]
        (from ``prepare_targets``), and applies one optimizer update from
        gradients psum'd over the whole mesh.
      * loss is (1-w)*L1 + w*(1-SSIM); under tile sharding the frame is
        all-gathered across the tile axis for the windowed SSIM term (one
        image of ICI traffic per camera).
    """
    dp = mesh.shape[DATA_AXIS]
    tp = mesh.shape[TILE_AXIS]
    n_tiles_x, num_tiles, padded, order = _tile_layout(
        width, height, raster_cfg.tile_size, tp
    )
    if tp > 1:
        # See make_sharded_render: shards cover interleaved tile subsets, so
        # the backward must use the interval-masked exact reduction.
        raster_cfg = dataclasses.replace(raster_cfg, exact_grad_reduction=True)
    order_np = np.asarray(order)
    optimizer = make_optimizer(train_cfg)

    # Per-tile pixel validity (image edge tiles include padding pixels).
    mask_img = jnp.ones((height, width), jnp.float32)
    pixel_mask = image_to_tiles(mask_img, raster_cfg.tile_size)  # [T, npix]
    pixel_mask = jnp.concatenate(
        [pixel_mask, jnp.zeros((padded - num_tiles, pixel_mask.shape[1]))], axis=0
    )[order_np]

    def local_loss(model, cams_l, targets_l, order_l, mask_l):
        """Loss contribution of one device: its cameras x its tile slab.

        cams_l: CameraArrays leaves [Bl, ...]; targets_l: [Bl, Tl, npix, 3];
        order_l: [Tl] global tile ids; mask_l: [Tl, npix] pixel validity.
        Returns (mean loss, mean mse), psum'd over the whole mesh.
        """

        def one_camera(args):
            cam, target_tiles = args
            feat, bins = _bin_for_camera(model, cam, width, height, raster_cfg)
            starts, counts = _gather_shard_inputs(bins, order_l, num_tiles)
            color, _ = rasterize_tiles(
                feat, bins.pair_gaussian, starts, counts, order_l,
                bins.gaussian_counts, n_tiles_x, raster_cfg,
            )
            npixels = width * height * 3
            mse = jnp.sum(((color - target_tiles) ** 2) * mask_l[:, :, None]) / npixels
            if train_cfg.ssim_weight > 0.0:
                if tp == 1:
                    color_full, target_full = color, target_tiles
                else:
                    # SSIM's 11x11 window crosses tile-shard boundaries, so
                    # assemble the full frame on every tile shard (one image
                    # of ICI traffic per camera; its autodiff transpose is a
                    # reduce-scatter of the image cotangent). The whole-image
                    # loss is then replicated across the tile axis — divide
                    # by tp so the later psum averages instead of summing.
                    color_full = jax.lax.all_gather(
                        color, TILE_AXIS, axis=0, tiled=True
                    )
                    target_full = jax.lax.all_gather(
                        target_tiles, TILE_AXIS, axis=0, tiled=True
                    )
                order_full = jnp.asarray(order_np, jnp.int32)
                image = tiles_to_image(
                    _unpermute(color_full, order_full, padded, num_tiles),
                    width, height, raster_cfg.tile_size,
                )
                target = tiles_to_image(
                    _unpermute(target_full, order_full, padded, num_tiles),
                    width, height, raster_cfg.tile_size,
                )
                loss = rgb_loss(image, target, train_cfg.ssim_weight) / tp
            else:
                loss = (
                    jnp.sum(jnp.abs(color - target_tiles) * mask_l[:, :, None])
                    / npixels
                )
            return loss, mse

        losses, mses = jax.lax.map(one_camera, (cams_l, targets_l))
        batch = losses.shape[0] * dp
        loss = jax.lax.psum(jnp.sum(losses), (DATA_AXIS, TILE_AXIS)) / batch
        mse = jax.lax.psum(jnp.sum(mses), (DATA_AXIS, TILE_AXIS)) / batch
        return loss, mse

    sharded_loss = jax.shard_map(
        local_loss,
        mesh=mesh,
        in_specs=(
            P(),  # model (replicated)
            P(DATA_AXIS),  # cameras
            P(DATA_AXIS, TILE_AXIS),  # target tiles
            P(TILE_AXIS),  # tile order slab
            P(TILE_AXIS),  # pixel mask slab
        ),
        out_specs=(P(), P()),
        check_vma=False,  # loop carries start mesh-invariant, become varying
    )

    @jax.jit
    def train_step(model, opt_state, cams, targets_tiles):
        order_j = jnp.asarray(order_np, jnp.int32)

        def loss_fn(m):
            return sharded_loss(m, cams, targets_tiles, order_j, pixel_mask)

        (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(model)
        updates, new_opt_state = optimizer.update(grads, opt_state, model)
        model = jax.tree.map(lambda p, u: p + u, model, updates)
        metrics = {"loss": loss, "psnr": -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))}
        return model, new_opt_state, metrics

    def init_state(model):
        return optimizer.init(model)

    def prepare_targets(targets: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] images -> [B, padded_tiles, npix, 3] in shard order."""
        tiles = jax.vmap(lambda im: image_to_tiles(im, raster_cfg.tile_size))(targets)
        pad = jnp.zeros(
            (tiles.shape[0], padded - num_tiles) + tiles.shape[2:], tiles.dtype
        )
        tiles = jnp.concatenate([tiles, pad], axis=1)
        return tiles[:, order_np]

    return train_step, init_state, prepare_targets
