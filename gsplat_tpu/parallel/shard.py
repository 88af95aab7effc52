"""shard_map-based multi-chip rendering and training.

Sharding layout (SURVEY.md §5.7-5.8, BASELINE.json config 5):
  * camera batch: sharded over the ``data`` mesh axis;
  * framebuffer tiles: sharded over the ``tile`` axis with a *2D-strided*
    ownership pattern — the tile factor tp = sy*sx and device (oy, ox) owns
    the tiles {(tx, ty) : tx ≡ ox (mod sx), ty ≡ oy (mod sy)}. Striding
    both axes decorrelates per-device gaussian load (neighbouring tiles have
    correlated pair counts) while keeping rect coverage separable per axis,
    which is what lets every shard *bin its own tiles only*;
  * per-gaussian preprocess: sharded over the ``tile`` axis by gaussian
    range — each device preprocesses N/tp gaussians and the packed feature
    rows + binning inputs are all-gathered (one [N, 24]-ish f32 exchange
    per camera riding ICI);
  * splat parameters: replicated; their gradients arrive via the autodiff
    transposes of the gather/slice chain (all-gather -> psum_scatter, then
    the shard_map transpose's psum over both axes), overlappable by XLA
    with the backward tile sweep.

Because each shard bins exactly the tiles it rasterizes, its pair buffer is
fully covered from slot 0 and its ``gaussian_counts`` describe exactly its
own pairs — so the backward's fast sort-based pair->gaussian reduction is
valid under sharding (round 1 had to force the ~0.5 s/4M-pair exact
segment_sum whenever tp > 1). The only replicated per-step work left is the
sortless binning's O(N) streaming prologue inside ``bin_rects`` (elementwise
rects/counts + histogram masks; no depth sort, and the overflow search is
cond-skipped when the view fits its budget).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gsplat_tpu.config import RasterConfig, TrainConfig
from gsplat_tpu.kernels.raster import _use_pallas, rasterize_tiles
from gsplat_tpu.models.gaussians import GaussianModel, pad_model as _pad_model
from gsplat_tpu.ops import binning
from gsplat_tpu.ops.camera import CameraArrays
from gsplat_tpu.parallel.mesh import DATA_AXIS, TILE_AXIS
from gsplat_tpu.render.pipeline import preprocess_traced
from gsplat_tpu.render.tile_jnp import image_to_tiles, tiles_to_image
from gsplat_tpu.train.loss import rgb_loss
from gsplat_tpu.train.trainer import make_optimizer


def _factor_stride(tp: int) -> Tuple[int, int]:
    """tp -> (sy, sx), sy*sx == tp, near-square with the larger factor on x
    (frames are wider than tall, so x usually has more tile columns)."""
    f = max(int(math.isqrt(tp)), 1)
    while tp % f:
        f -= 1
    return f, tp // f


@dataclasses.dataclass(frozen=True)
class _ShardLayout:
    """Static bookkeeping for the strided tile->device assignment.

    Stacked order (what shard_map's tile-axis concat produces) is
    ``pos = d * tiles_local + local`` with ``d = (ty % sy)*sx + (tx % sx)``
    and ``local = (ty // sy)*ntx_l + (tx // sx)``.
    """

    sy: int
    sx: int
    ntx_g: int
    nty_g: int
    ntx_l: int
    nty_l: int
    pos_of_global: np.ndarray  # [T_global] -> index into the stacked tiles
    src_of_stacked: np.ndarray  # [tp*T_local] -> global tile id, or -1 (pad)

    @property
    def tiles_local(self) -> int:
        return self.ntx_l * self.nty_l


def _make_layout(width: int, height: int, tile_size: int, tp: int) -> _ShardLayout:
    ntx_g = -(-width // tile_size)
    nty_g = -(-height // tile_size)
    sy, sx = _factor_stride(tp)
    ntx_l = -(-ntx_g // sx)
    nty_l = -(-nty_g // sy)
    t_l = ntx_l * nty_l
    ty, tx = np.divmod(np.arange(nty_g * ntx_g), ntx_g)
    d = (ty % sy) * sx + (tx % sx)
    local = (ty // sy) * ntx_l + (tx // sx)
    pos = d * t_l + local
    src = np.full(tp * t_l, -1, np.int64)
    src[pos] = np.arange(nty_g * ntx_g)
    return _ShardLayout(sy, sx, ntx_g, nty_g, ntx_l, nty_l, pos, src)




def _shard_bin(
    model_p: GaussianModel,
    cam: CameraArrays,
    lay: _ShardLayout,
    width: int,
    height: int,
    cfg: RasterConfig,
    n_local: int,
    screen_offset=None,
):
    """One shard's preprocess + binning, called inside shard_map: preprocess
    this device's gaussian slice, all-gather packed rows, bin this device's
    strided tile subset. Returns (feat [N+1, 16], bins, tile_ids [T_l]).

    ``screen_offset``: optional replicated [C_pool, 2] viewspace-gradient
    probe (train/densify.py), sliced alongside the model."""
    tp = lay.sy * lay.sx
    d = jax.lax.axis_index(TILE_AXIS)
    ox = d % lay.sx
    oy = d // lay.sx

    def slice_rows(x):
        return jax.lax.dynamic_slice_in_dim(x, d * n_local, n_local, axis=0)

    sl = jax.tree.map(slice_rows, model_p)
    off_l = None if screen_offset is None else slice_rows(screen_offset)
    prep = preprocess_traced(sl, cam, width, height, cfg, off_l)
    feat_rows = binning.pack_feature_rows(prep)
    binput = jnp.concatenate(
        [
            prep.depth[:, None],
            prep.active.astype(jnp.float32)[:, None],
            prep.cull_bbox.astype(jnp.float32),  # pixel coords: exact in f32
        ],
        axis=1,
    )  # [n_local, 6]

    # Global-grid tile histogram, sharded over the gaussian axis: each
    # device histograms ITS OWN N/tp slice against the whole tile grid and
    # one tiny [nty_g, ntx_g] psum replaces every shard's N-scale local
    # histogram inside bin_rects — the mask-build cost then shrinks with
    # the tile factor instead of staying replicated (SCALING_r04 Amdahl
    # tail). The strided extraction below is exact whenever no gaussian is
    # dropped; bin_rects falls back to its kept-gated local histogram
    # under capacity overflow.
    g_rects = binning.tile_ranges(
        prep.cull_bbox, cfg.tile_size, lay.ntx_g, lay.nty_g
    )
    keep = prep.active & (g_rects[2] > 0) & (g_rects[3] > 0)
    counts2d_g = binning.coverage_histogram(
        g_rects, keep, lay.ntx_g, lay.nty_g
    )
    if tp > 1:
        counts2d_g = jax.lax.psum(counts2d_g, TILE_AXIS)
        feat_rows = jax.lax.all_gather(feat_rows, TILE_AXIS, axis=0, tiled=True)
        binput = jax.lax.all_gather(binput, TILE_AXIS, axis=0, tiled=True)
    # Strided extraction of this shard's tiles: global row ty = j*sy + oy,
    # col tx = i*sx + ox (pad the grid up to the stride multiple first).
    c2 = jnp.pad(
        counts2d_g,
        ((0, lay.sy * lay.nty_l - lay.nty_g), (0, lay.sx * lay.ntx_l - lay.ntx_g)),
    )
    tile_count_o = (
        c2.reshape(lay.nty_l, lay.sy, lay.ntx_l, lay.sx)[:, oy, :, ox]
        .reshape(lay.tiles_local)
        .astype(jnp.int32)
    )
    depth = binput[:, 0]
    active = binput[:, 1] > 0.5
    cull_bbox = binput[:, 2:6].astype(jnp.int32)

    rects = binning.strided_tile_ranges(
        cull_bbox, cfg.tile_size, lay.ntx_g, lay.nty_g, lay.sx, lay.sy, ox, oy
    )
    if _use_pallas(cfg):
        # Fused sort-carried pair slab (see render/pipeline.py): binning
        # emits this shard's dense feature blocks directly.
        bins, pair_feat = binning.bin_rects(
            depth, active, rects, lay.ntx_l, lay.nty_l, cfg.max_pairs,
            align=cfg.pair_block,
            feat_rows=jax.lax.stop_gradient(feat_rows),
            tile_count_override=tile_count_o,
        )
        pair_feat_i32 = jnp.asarray(
            jax.lax.bitcast_convert_type(pair_feat, jnp.int32)
        )
    else:
        bins = binning.bin_rects(
            depth, active, rects, lay.ntx_l, lay.nty_l, cfg.max_pairs,
            align=cfg.pair_block, tile_count_override=tile_count_o,
        )
        pair_feat_i32 = None
    feat = jnp.concatenate(
        [feat_rows, jnp.zeros((1, feat_rows.shape[1]), feat_rows.dtype)], axis=0
    )

    li = jnp.arange(lay.tiles_local, dtype=jnp.int32)
    tile_ids = (oy + (li // lay.ntx_l) * lay.sy) * lay.ntx_g + ox + (li % lay.ntx_l) * lay.sx
    return feat, bins, tile_ids, pair_feat_i32


def _shard_render_tiles(
    model_p: GaussianModel,
    cam: CameraArrays,
    lay: _ShardLayout,
    width: int,
    height: int,
    cfg: RasterConfig,
    n_local: int,
    screen_offset=None,
):
    """One shard's render (see :func:`_shard_bin`): bin this device's strided
    tile subset, then rasterize it. Returns (color [T_l, npix, 3],
    trans [T_l, npix])."""
    feat, bins, tile_ids, pair_feat_i32 = _shard_bin(
        model_p, cam, lay, width, height, cfg, n_local, screen_offset
    )
    color, trans = rasterize_tiles(
        feat, bins.pair_gaussian, bins.tile_start, bins.tile_count,
        tile_ids, bins.gaussian_counts, lay.ntx_g, cfg,
        pair_feat_i32=pair_feat_i32, width=width, height=height,
    )
    return color, trans


def make_sharded_binning_stats(
    mesh: Mesh, width: int, height: int, cfg: RasterConfig
) -> Callable[[GaussianModel, CameraArrays], dict]:
    """Per-shard pair-budget diagnostics under the strided tile sharding.

    ``cfg.max_pairs`` is the PER-SHARD capacity, and the 2D-strided layout
    only *decorrelates* per-shard load — it does not equalize it — so the
    binding number is the MAX over shards of each shard's own strided-binning
    ``pair_demand`` (psum-maxed across the mesh), not whole-frame demand
    divided by the tile factor. Returns fn(model, cam) -> dict with
    ``max_shard_demand`` / ``overflowed`` (round-2 ADVICE: a hot shard can
    exceed the 1.5x headroom even when the divided estimate passes)."""
    tp = mesh.shape[TILE_AXIS]
    lay = _make_layout(width, height, cfg.tile_size, tp)
    axes = (DATA_AXIS, TILE_AXIS)

    @jax.jit
    def stats_fn(model: GaussianModel, cam: CameraArrays) -> dict:
        n_local = -(-model.num_gaussians // tp)
        model_p = _pad_model(model, n_local * tp)

        def shard_fn(m, c):
            bins = _shard_bin(m, c, lay, width, height, cfg, n_local)[1]
            return (
                jax.lax.pmax(bins.pair_demand, axes),
                jax.lax.pmax(bins.num_pairs, axes),
            )

        demand, num_pairs = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(model_p, cam)
        return {
            "max_shard_demand": demand,
            "max_shard_pairs": num_pairs,
            "capacity": jnp.int32(cfg.max_pairs),
            "overflowed": demand > cfg.max_pairs,
        }

    return stats_fn


def _stacked_to_image(stacked, pos_j, width, height, tile_size):
    """[tp*T_l, npix, C...] stacked shard outputs -> [H, W, C...]."""
    return tiles_to_image(stacked[pos_j], width, height, tile_size)


def make_sharded_render(
    mesh: Mesh, width: int, height: int, cfg: RasterConfig
) -> Callable[[GaussianModel, CameraArrays], Tuple[jnp.ndarray, jnp.ndarray]]:
    """Tile-sharded single-view render: returns fn(model, cam) -> (image, T)."""
    tp = mesh.shape[TILE_AXIS]
    lay = _make_layout(width, height, cfg.tile_size, tp)
    pos_j = jnp.asarray(lay.pos_of_global, jnp.int32)

    @jax.jit
    def render_fn(model: GaussianModel, cam: CameraArrays):
        n_local = -(-model.num_gaussians // tp)
        model_p = _pad_model(model, n_local * tp)

        def shard_fn(m, c):
            return _shard_render_tiles(m, c, lay, width, height, cfg, n_local)

        color, trans = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P()),
            out_specs=(P(TILE_AXIS), P(TILE_AXIS)),
            check_vma=False,  # loop carries start mesh-invariant, become varying
        )(model_p, cam)
        return (
            _stacked_to_image(color, pos_j, width, height, cfg.tile_size),
            _stacked_to_image(trans, pos_j, width, height, cfg.tile_size),
        )

    return render_fn


def make_batch_render(
    mesh: Mesh, width: int, height: int, cfg: RasterConfig
) -> Callable[[GaussianModel, CameraArrays], Tuple[jnp.ndarray, jnp.ndarray]]:
    """Batched multi-view render over the full (data x tile) mesh — the
    serving/orbit-video workload: the camera batch is sharded over the
    ``data`` axis (each data row renders its own frames, sequentially via
    lax.map) and each frame's tile grid over the ``tile`` axis. Returns
    fn(model, cams) -> (images [B, H, W, 3], trans [B, H, W]) with B
    divisible by the data-axis size; splat parameters are replicated (one
    per-frame feature all-gather rides the tile axis, nothing crosses the
    data axis)."""
    dp = mesh.shape[DATA_AXIS]
    tp = mesh.shape[TILE_AXIS]
    lay = _make_layout(width, height, cfg.tile_size, tp)
    pos_j = jnp.asarray(lay.pos_of_global, jnp.int32)

    @jax.jit
    def render_fn(model: GaussianModel, cams: CameraArrays):
        batch = jax.tree.leaves(cams)[0].shape[0]
        if batch % dp != 0:
            raise ValueError(
                f"camera batch ({batch}) must be divisible by the data-axis "
                f"size ({dp}); pad the batch (see cli.py orbit)"
            )
        n_local = -(-model.num_gaussians // tp)
        model_p = _pad_model(model, n_local * tp)

        def shard_fn(m, cams_l):
            return jax.lax.map(
                lambda c: _shard_render_tiles(
                    m, c, lay, width, height, cfg, n_local
                ),
                cams_l,
            )  # ([Bl, T_l, npix, 3], [Bl, T_l, npix])

        color, trans = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS, TILE_AXIS), P(DATA_AXIS, TILE_AXIS)),
            check_vma=False,
        )(model_p, cams)
        to_img = jax.vmap(
            lambda t: _stacked_to_image(t, pos_j, width, height, cfg.tile_size)
        )
        return to_img(color), to_img(trans)

    return render_fn


def make_parallel_train_step(
    mesh: Mesh,
    width: int,
    height: int,
    raster_cfg: RasterConfig,
    train_cfg: TrainConfig,
    with_viewspace_grad: bool = False,
):
    """Build a (data x tile)-parallel train step.

    Returns (train_step, init_state, prepare_targets):
      * ``train_step(model, opt_state, cams, targets_tiles, bg=None)``
        consumes a camera batch (stacked CameraArrays, leaves [B, ...]; B
        divisible by the data axis) and pre-tiled targets
        [B, tp*T_l, npix, 3] (from ``prepare_targets``), and applies one
        optimizer update from gradients psum'd over the whole mesh. ``bg``
        ([3], replicated) is composited via the residual transmittance
        (TrainConfig.background; None = black, the reference default).
      * loss is (1-w)*L1 + w*(1-SSIM); under tile sharding the frame is
        all-gathered across the tile axis for the windowed SSIM term (one
        image of ICI traffic per camera);
      * with ``with_viewspace_grad`` the step additionally returns the
        PER-VIEW viewspace positional gradients [B, N, 2] (the probe offset
        is laid out per camera and sharded over the data axis, so each
        view's gradient stays a separate sample — psum'd over the tile axis
        only). Feeding each row to ``train/densify.py accumulate`` matches
        the single-host Trainer's per-view counting exactly, so
        ``DensifyConfig.grad_threshold`` needs no recalibration under dp.
    """
    dp = mesh.shape[DATA_AXIS]
    tp = mesh.shape[TILE_AXIS]
    lay = _make_layout(width, height, raster_cfg.tile_size, tp)
    pos_np = lay.pos_of_global
    src_np = lay.src_of_stacked
    optimizer = make_optimizer(train_cfg)

    # Per-tile pixel validity (image edge tiles include padding pixels), in
    # stacked shard order; shard-padding tiles are all-invalid.
    mask_img = jnp.ones((height, width), jnp.float32)
    mask_tiles = image_to_tiles(mask_img, raster_cfg.tile_size)  # [T_g, npix]
    valid_src = src_np >= 0
    safe_src = np.where(valid_src, src_np, 0)
    pixel_mask = jnp.where(
        jnp.asarray(valid_src)[:, None], mask_tiles[jnp.asarray(safe_src)], 0.0
    )  # [tp*T_l, npix]

    def local_loss(model_p, off_p, cams_l, targets_l, mask_l, bg, n_local):
        """Loss contribution of one device: its cameras x its tile slab.

        model_p: replicated padded model; off_p: this data row's viewspace
        probes [Bl, N_pad, 2] (per camera — each view's probe gradient stays
        a separate sample); cams_l: CameraArrays leaves [Bl, ...];
        targets_l: [Bl, T_l, npix, 3]; mask_l: [T_l, npix] pixel validity
        of this shard's tiles; bg: replicated background color [3]
        (TrainConfig.background). Returns (mean loss, mean mse), psum'd
        over the whole mesh.
        """

        def one_camera(args):
            cam, target_tiles, off_row = args
            color, trans = _shard_render_tiles(
                model_p, cam, lay, width, height, raster_cfg, n_local, off_row
            )
            color = color + trans[..., None] * bg
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
                pos_full = jnp.asarray(pos_np, jnp.int32)
                image = _stacked_to_image(
                    color_full, pos_full, width, height, raster_cfg.tile_size
                )
                target = _stacked_to_image(
                    target_full, pos_full, width, height, raster_cfg.tile_size
                )
                loss = rgb_loss(image, target, train_cfg.ssim_weight) / tp
            else:
                loss = (
                    jnp.sum(jnp.abs(color - target_tiles) * mask_l[:, :, None])
                    / npixels
                )
            return loss, mse

        losses, mses = jax.lax.map(one_camera, (cams_l, targets_l, off_p))
        batch = losses.shape[0] * dp
        loss = jax.lax.psum(jnp.sum(losses), (DATA_AXIS, TILE_AXIS)) / batch
        mse = jax.lax.psum(jnp.sum(mses), (DATA_AXIS, TILE_AXIS)) / batch
        return loss, mse

    @jax.jit
    def _train_step(model, opt_state, cams, targets_tiles, bg):
        n_local = -(-model.num_gaussians // tp)

        sharded_loss = jax.shard_map(
            lambda m, o, c, t, k, b: local_loss(m, o, c, t, k, b, n_local),
            mesh=mesh,
            in_specs=(
                P(),  # padded model (replicated)
                P(DATA_AXIS),  # per-view viewspace probes [B, N_pad, 2]
                P(DATA_AXIS),  # cameras
                P(DATA_AXIS, TILE_AXIS),  # target tiles (stacked shard order)
                P(TILE_AXIS),  # pixel-mask slab
                P(),  # background color (replicated)
            ),
            out_specs=(P(), P()),
            check_vma=False,  # loop carries start mesh-invariant, become varying
        )

        batch = jax.tree.leaves(cams)[0].shape[0]
        offset = jnp.zeros((batch, n_local * tp, 2), model.means.dtype)

        def loss_fn(m, off):
            m_p = _pad_model(m, n_local * tp)
            return sharded_loss(m_p, off, cams, targets_tiles, pixel_mask, bg)

        (loss, mse), (grads, vs_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(model, offset)
        updates, new_opt_state = optimizer.update(grads, opt_state, model)
        model = jax.tree.map(lambda p, u: p + u, model, updates)
        metrics = {"loss": loss, "psnr": -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))}
        if with_viewspace_grad:
            # loss averages over the batch, so each probe row carries a
            # 1/batch factor; undo it so row b is d(loss of view b)/d(offset)
            # — numerically identical to the single-host per-view probe at
            # any dp width (grad_threshold stays calibrated).
            return (
                model, new_opt_state, metrics,
                vs_grad[:, : model.num_gaussians] * batch,
            )
        return model, new_opt_state, metrics

    def train_step(model, opt_state, cams, targets_tiles, bg=None):
        """One sharded update. ``bg``: background color [3] composited via
        the residual transmittance (defaults to black — the reference's
        implicit framebuffer, rasterize.py:437)."""
        if bg is None:
            bg = jnp.zeros((3,), jnp.float32)
        return _train_step(model, opt_state, cams, targets_tiles, bg)

    def init_state(model):
        return optimizer.init(model)

    def prepare_targets(targets: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] images -> [B, tp*T_l, npix, 3] in stacked shard order."""
        tiles = jax.vmap(lambda im: image_to_tiles(im, raster_cfg.tile_size))(targets)
        safe = jnp.asarray(safe_src, jnp.int32)
        picked = tiles[:, safe]  # [B, tp*T_l, npix, 3]
        return jnp.where(jnp.asarray(valid_src)[None, :, None, None], picked, 0.0)

    return train_step, init_state, prepare_targets


@dataclasses.dataclass
class ParallelTrainer:
    """Multi-chip counterpart of ``train.trainer.Trainer``: the same
    ``fit(model, views)`` surface, executed as (data x tile)-sharded steps.

    Views are round-robin batched ``data``-axis-wide per step (every data
    row trains a different camera of the batch); all frames must share one
    resolution (they fix array shapes). Densification runs on the
    replicated pool between sharded steps, fed by the psum'd viewspace
    probe (train/densify.py).
    """

    mesh: Mesh
    raster: RasterConfig
    train: TrainConfig
    auto_pairs: bool = True
    show_progress: bool = True
    _stats_fn: object = None  # cached per-shard demand probe (check_capacity)

    def __post_init__(self):
        if self.train.background not in ("black", "white", "random"):
            raise ValueError(
                f"TrainConfig.background must be black|white|random, "
                f"got {self.train.background!r}"
            )
        self._bg_rng = np.random.default_rng(0)

    def draw_background(self) -> jnp.ndarray:
        """This step's background color [3] (one draw per step, shared by
        every camera of the batch — the 3DGS random-background convention)."""
        if self.train.background == "white":
            return jnp.ones((3,), jnp.float32)
        if self.train.background == "random":
            return jnp.asarray(self._bg_rng.uniform(size=3).astype(np.float32))
        return jnp.zeros((3,), jnp.float32)

    def check_capacity(self, model, cams, width, height) -> bool:
        """Measure the MAX per-shard pair demand of the strided binning over
        the given CameraArrays (the binding number — ``max_pairs`` is the
        per-shard capacity and the strided layout only decorrelates load).
        On overflow: resize ``self.raster`` (auto_pairs) and return True
        (caller rebuilds the sharded step), or warn loudly."""
        from gsplat_tpu.render.pipeline import required_max_pairs
        from gsplat_tpu.utils.logging import get_logger

        logger = get_logger()
        if self._stats_fn is None:
            self._stats_fn = make_sharded_binning_stats(
                self.mesh, width, height, self.raster
            )
        demand = 0
        for cam in cams:
            demand = max(
                demand, int(self._stats_fn(model, cam)["max_shard_demand"])
            )
        if demand <= self.raster.max_pairs:
            return False
        target = required_max_pairs(demand)
        if self.auto_pairs:
            logger.warning(
                "per-shard pair demand %d exceeds capacity %d: resizing "
                "max_pairs to %d (one recompile)",
                demand, self.raster.max_pairs, target,
            )
            self.raster = dataclasses.replace(self.raster, max_pairs=target)
            self._stats_fn = None  # capacity is baked into the probe
            return True
        logger.warning(
            "per-shard pair demand %d exceeds capacity %d: deepest splats "
            "will be dropped (suggested max_pairs=%d)",
            demand, self.raster.max_pairs, target,
        )
        return False

    def fit(self, model, views, steps=None, log_fn=None,
            checkpoint_dir=None, resume=False):
        """Same surface and checkpoint/resume semantics as
        ``train.trainer.Trainer.fit`` (loop state at
        ``<checkpoint_dir>/train_state`` every ``train.checkpoint_every``
        steps; ``resume=True`` continues the identical trajectory)."""
        import jax as _jax

        from gsplat_tpu.utils.logging import get_logger
        from gsplat_tpu.utils.progress import progress

        logger = get_logger()
        steps = steps if steps is not None else self.train.steps
        dp = self.mesh.shape[DATA_AXIS]
        width = views[0][0].width
        height = views[0][0].height
        if any(c.width != width or c.height != height for c, _ in views):
            raise ValueError("all views must share one resolution")

        dc = self.train.densify
        dstate = key = None
        opt_state = None
        start_step = 0
        resumed = False
        if checkpoint_dir:
            from gsplat_tpu.train import checkpoint as CK
        if resume and checkpoint_dir and CK.has_loop_state(checkpoint_dir):
            model, opt_state, start_step, dstate, key = CK.restore_loop_state(
                checkpoint_dir, make_optimizer(self.train).init
            )
            resumed = True
            logger.info(
                "resumed from %s at step %d",
                CK.loop_state_path(checkpoint_dir), start_step,
            )
            if self.train.background == "random":
                for _ in range(start_step):
                    self._bg_rng.uniform(size=3)

        cams_all = [CameraArrays.from_params(c) for c, _ in views]
        self._stats_fn = None
        self.check_capacity(model, cams_all, width, height)

        if dc is not None:
            from gsplat_tpu.train import densify as D

            extent = D.camera_extent([c for c, _ in views])
            if not resumed:
                model = D.init_pool(model, dc)
                dstate = D.DensifyState.zero(model.num_gaussians)
                key = _jax.random.key(0)

            # Per-view projected radii for the screen-size prune (3DGS
            # max_radii2D): one replicated preprocess per batch view —
            # N-scale only, tiny next to the sharded render step.
            @partial(jax.jit, static_argnames=("cfg",))
            def _radii_fn(m, cams_b, cfg):
                def one(cam):
                    prep = preprocess_traced(m, cam, width, height, cfg)
                    return D.screen_radii(prep.conics, prep.active)

                return jax.lax.map(one, cams_b)  # [B, N]

        def build_step(sh_degree=None):
            cfg = self.raster
            if sh_degree is not None and sh_degree != cfg.sh_degree:
                cfg = dataclasses.replace(cfg, sh_degree=sh_degree)
            return make_parallel_train_step(
                self.mesh, width, height, cfg, self.train,
                with_viewspace_grad=dc is not None,
            )

        cur_deg = (
            0 if self.train.sh_warmup_every > 0 else self.raster.sh_degree
        )
        step_fn, init_state, prepare_targets = build_step(cur_deg)
        targets_all = [prepare_targets(jnp.stack([t])) for _, t in views]
        if not resumed:
            opt_state = init_state(model)
        history = []
        for step in progress(
            range(start_step, steps), desc="fit", enabled=self.show_progress
        ):
            # 3DGS SH warmup: color detail introduced band by band (one
            # rebuild per degree bump — same schedule as Trainer.fit).
            if self.train.sh_warmup_every > 0:
                deg = min(
                    step // self.train.sh_warmup_every, self.raster.sh_degree
                )
                if deg != cur_deg:
                    step_fn, _, _ = build_step(deg)
                    cur_deg = deg
            idx = [(step * dp + i) % len(views) for i in range(dp)]
            cams = CameraArrays.stack([cams_all[i] for i in idx])
            targets = jnp.concatenate([targets_all[i] for i in idx], axis=0)
            bg = self.draw_background()
            if dc is None:
                model, opt_state, metrics = step_fn(
                    model, opt_state, cams, targets, bg
                )
            else:
                # Radii from the pre-update model — the footprints of the
                # forward pass this step trains on (3DGS updates
                # max_radii2D from the same render it backprops).
                radii_b = _radii_fn(model, cams, self.raster)
                model, opt_state, metrics, vs = step_fn(
                    model, opt_state, cams, targets, bg
                )
                # vs is [B, N, 2], one row per camera of the batch: fold each
                # view in as its own sample (identical counting to the
                # single-host Trainer, any dp width).
                for b in range(vs.shape[0]):
                    dstate = D.accumulate(
                        dstate, vs[b], width, height, radii_b[b]
                    )
                if dc.start <= step < dc.until and step > 0 and step % dc.every == 0:
                    key, sub = _jax.random.split(key)
                    model, touched, dstats = D.densify_prune_step(
                        model, dstate, sub, extent, dc, step=step
                    )
                    opt_state = D.reset_opt_rows(opt_state, touched)
                    dstate = D.DensifyState.zero(model.num_gaussians)
                    logger.info(
                        "densify @%d: +%d clone +%d split -%d prune (%d alive)",
                        step, int(dstats["cloned"]), int(dstats["split"]),
                        int(dstats["pruned"]), int(dstats["alive"]),
                    )
                    # Clones/splits grow pair demand mid-training; re-check
                    # the batch's views and rebuild the sharded step if the
                    # budget grew (round-2 ADVICE, medium).
                    if self.check_capacity(
                        model, [cams_all[i] for i in idx], width, height
                    ):
                        step_fn, _, _ = build_step(cur_deg)
                if dc.opacity_reset_every and step > 0 and (
                    step % dc.opacity_reset_every == 0
                ):
                    model = D.reset_opacity(model)
            if step % self.train.log_every == 0 or step == steps - 1:
                record = {k: float(v) for k, v in metrics.items()}
                record["step"] = step
                history.append(record)
                if log_fn is not None:
                    log_fn(record)
                if step > 0 and self.check_capacity(
                    model, [cams_all[idx[0]]], width, height
                ):
                    step_fn, _, _ = build_step(cur_deg)
            if (
                checkpoint_dir
                and self.train.checkpoint_every > 0
                and (step + 1) % self.train.checkpoint_every == 0
                and step + 1 < steps
            ):
                CK.save_loop_state(
                    checkpoint_dir, model, opt_state, step + 1, dstate, key
                )
        if checkpoint_dir:
            CK.save_loop_state(checkpoint_dir, model, opt_state, steps, dstate, key)
        if dc is not None:
            from gsplat_tpu.train import densify as D

            model = D.compact(model)
        return model, history
