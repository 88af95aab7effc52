"""Configuration dataclasses for the TPU Gaussian Splatting framework.

The reference exposes its configuration as module-level constants
(``rasterize.py:29-38``) plus six click CLI flags (``rasterize.py:308-314``).
Here everything is collected into frozen dataclasses so that configs are
hashable and can be passed as static arguments to ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# --- Constants matching the reference semantics (rasterize.py:29-38) ---
Z_FAR = 100.0
Z_NEAR = 0.01
GAUSSIAN_SPREAD = 3  # bbox radius = ceil(3 * max std-dev)
BLOCK_SIZE = 16  # reference's CUDA block size used for bbox rounding
MAX_GAUSSIAN_DENSITY = 0.99  # alpha clamp
MIN_ALPHA = 1.0 / 255.0  # contributions below this are skipped
FRUSTUM_NEAR_Z = 0.2  # camera-space z below which gaussians are culled
EIGENVALUE_FLOOR = 0.1  # floor inside sqrt when computing 2D spread
COV2D_LOWPASS = 0.3  # added to the diagonal of the projected covariance
PERSPECTIVE_EPS = 1e-7  # epsilon added to w before the perspective divide
EWA_TAN_CLAMP = 1.3  # view-cone clamp multiplier on tan(fov)


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static rasterization settings (hashable -> usable as a jit static arg).

    Attributes:
      tile_size: pixel tile edge. 32x32 = 1024 pixels = one (8,128) f32 VPU
        tile; the TPU-native analogue of the reference's 16x16 CUDA block.
      chunk_size: gaussians composited per inner step of the tile loop.
      pair_block: pairs per dense DMA block of the Pallas kernels' feature /
        gradient slabs ([nblk, 16, pair_block] column-major — 64 B/pair vs
        the 512 B/pair a lane-padded row slab costs). Binning segments are
        aligned to this (``align=pair_block``). 128 matches the TPU lane
        width; must be a multiple of chunk_size. Tests with the jnp path may
        shrink it alongside chunk_size.
      max_pairs: static capacity of the (tile, gaussian) pair buffer. The
        renderer reports overflow; callers may re-render with a bigger value.
      sh_degree: spherical-harmonics degree for view-dependent color (0-3).
      early_stop_transmittance: if >0, a tile chunk-loop stops once every
        pixel's remaining transmittance is below this. The reference has no
        early termination (SURVEY.md C17), so parity tests use 0.0.
      strict_parity: reproduce the reference's skip conditions exactly,
        including skipping gaussians where *any* conic coefficient is zero
        (rasterize.py:441).
    """

    tile_size: int = 32
    chunk_size: int = 32
    pair_block: int = 128
    max_pairs: int = 1 << 20
    sh_degree: int = 3
    early_stop_transmittance: float = 0.0
    strict_parity: bool = True
    use_pallas: bool = True
    # True: per-gaussian gradients reduce with an exact (slow on TPU)
    # segment_sum; False: sort + cumsum-difference reduction (~5x faster,
    # reorders f32 additions — ~1e-5 relative noise on the gradient scale).
    exact_grad_reduction: bool = False
    # Pair capacity of the COMPACTED gradient reduction (0 = off). With
    # early termination at real-scene density the forward composites only a
    # few percent of the pair blocks; the backward then gathers just the
    # written blocks (block-granular row gathers — cheap) into a buffer of
    # this many pairs and runs the sort-based reduction at that scale
    # instead of over the whole pair buffer. Exact: if a frame's composited
    # pairs exceed the capacity, a lax.cond falls back to the full-buffer
    # reduction. Sized like max_pairs (pair_block-aligned); worthwhile at
    # ~<=1/4 of max_pairs.
    reduce_pairs: int = 0
    # Depth-sliced lazy binning (render/sliced.py): when > 0, the Pallas
    # renderer processes pairs in front-to-back depth slices of this many
    # pairs (pair_block multiple), stopping as soon as every tile's
    # transmittance has collapsed below early_stop_transmittance — the
    # P-scale sort/gather work then tracks *composited* pairs instead of
    # total demand (at real MipNeRF-360 density early stop composites only
    # ~6% of pair blocks; PROFILE_r04_real.txt). The total pair budget is
    # still max_pairs: at most ceil(max_pairs / slice_pairs) slices run
    # (deepest-gaussians-dropped overflow policy, as in ops/binning.py).
    # 0 = the standard single-sort pipeline. Single-chip path only.
    slice_pairs: int = 0
    # True: the forward's gathered pair-feature blocks are kept as a
    # residual and reused by the backward (saves the multi-M-row gather).
    # False: the backward regathers them — lower peak HBM residency across
    # the loss computation, for memory-tight giant scenes.
    share_pair_feat: bool = True
    # Testing only: run the Pallas kernels in interpreter mode on non-TPU
    # backends (exercises the exact kernel code paths, e.g. the sharded
    # backward, on the CPU test mesh).
    force_pallas_interpret: bool = False

    @property
    def pixels_per_tile(self) -> int:
        return self.tile_size * self.tile_size


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    """Adaptive density control (the 3DGS clone/split/prune recipe) on a
    fixed-capacity gaussian pool — static shapes throughout, so densification
    never recompiles: pruned slots become inert (opacity collapsed -> zero
    pairs) and are reused by later clones/splits.

    Attributes:
      every/start/until: run the densify+prune pass every ``every`` steps
        within [start, until).
      grad_threshold: mean viewspace positional-gradient norm (NDC scale, the
        3DGS convention — the pixel-space probe is rescaled by 0.5*W/H in
        ``densify.accumulate``) above which a gaussian is densified.
        Counting convention: the mean is over steps in which the gaussian
        received ANY gradient ("seen"), which matches 3DGS's per-view
        visibility counting when each step trains one view (the single-host
        Trainer). The ParallelTrainer keeps the same convention under data
        parallelism: the viewspace probe is laid out per camera and sharded
        over the data axis, so each view of the batch is accumulated as its
        own sample — avg_grad (and this threshold) is comparable across dp
        widths.
      min_opacity: activated opacity below which a gaussian is pruned.
      prune_scale_extent: world-space size prune — a gaussian whose largest
        scale exceeds this fraction of the scene extent is pruned (3DGS's
        ``big_points_ws``, 0.1 * extent).
      max_screen_size: screen-space size prune — a gaussian whose maximum
        projected radius over the accumulation window exceeds this many
        pixels is pruned (3DGS's ``big_points_vs`` / ``max_radii2D``
        threshold, default 20). 0 disables both size-prune criteria.
      size_prune_start: step at which the two size-prune criteria engage
        (3DGS gates them on ``iteration > opacity_reset_interval`` = 3000;
        the warmup lets splats grow before size policing starts).
      percent_dense: scale cutoff (fraction of the camera extent) separating
        clone (small splat, under-reconstruction) from split (large splat,
        over-reconstruction).
      split_factor: scale shrink for split gaussians.
      opacity_reset_every: clamp opacity to <= 0.01 at this cadence
        (0 = never).
      pool_factor: pool capacity = pool_factor * initial gaussian count.
    """

    every: int = 100
    start: int = 100
    until: int = 1 << 30
    grad_threshold: float = 2e-4
    min_opacity: float = 0.005
    prune_scale_extent: float = 0.1
    max_screen_size: float = 20.0
    size_prune_start: int = 3000
    percent_dense: float = 0.01
    split_factor: float = 1.6
    opacity_reset_every: int = 0
    pool_factor: float = 2.0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training / fine-tuning settings (the reference is inference-only;
    this covers the backward-pass workload from BASELINE.json)."""

    lr_means: float = 1.6e-4
    lr_scales: float = 5e-3
    lr_quats: float = 1e-3
    lr_opacity: float = 5e-2
    lr_sh: float = 2.5e-3
    # 3DGS position-lr schedule: exponential (log-linear) decay of lr_means
    # down to lr_means_final over lr_means_decay_steps optimizer updates,
    # clamped there after (3DGS defaults: 1.6e-4 -> 1.6e-6 over 30k steps,
    # both pre-scaled by the scene extent). 0 steps = constant lr.
    lr_means_final: float = 0.0
    lr_means_decay_steps: int = 0
    ssim_weight: float = 0.2  # loss = (1-w)*L1 + w*(1-SSIM)
    # Training background: the renderer composites onto this color via the
    # residual transmittance (image + T * bg). "black" is the reference's
    # implicit background (framebuffer zeros, rasterize.py:437); "white"
    # suits white-matted captures; "random" draws a fresh color every step
    # (3DGS's --random_background floater suppression).
    background: str = "black"
    steps: int = 1000
    log_every: int = 50
    checkpoint_every: int = 500
    densify: Optional[DensifyConfig] = None
    # 3DGS SH warmup: train with SH degree min(step // this, raster degree),
    # one recompile per bump (0 = full degree from step 0).
    sh_warmup_every: int = 0


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. axes: data (camera batch) x tile (framebuffer)."""

    data: int = 1
    tile: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.tile
