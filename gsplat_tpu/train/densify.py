"""Adaptive density control: the 3DGS clone / split / prune recipe,
re-designed for TPU static shapes.

The original CUDA trainer grows and shrinks its parameter tensors every
densification step (gaussian-splatting's densify_and_prune) — dynamic
shapes XLA cannot compile. Here the model lives in a *fixed-capacity pool*
(models/gaussians.pad_model): dead slots carry ``DEAD_OPACITY_LOGIT``
(sigmoid ~ 1e-13), which empties their alpha-cull rect so they can never
emit a (tile, gaussian) pair — they cost preprocess/sort FLOPs but never
touch the rasterizer. Densification then never reshapes or recompiles:

  * prune: collapse the opacity of low-opacity gaussians -> slot freed;
  * clone/split: candidates (mean viewspace gradient over the window above
    ``grad_threshold``, as in 3DGS) are matched to free slots with one
    value-carrying sort each (no dynamic shapes, no scatter conflicts):
    the i-th best candidate fills the i-th free slot, for
    i < min(#candidates, #free);
  * clone (small splat, under-reconstruction): the new slot is an exact
    copy — the optimizer separates the pair through subsequent gradients;
  * split (large splat, over-reconstruction): both the original and the
    new slot shrink by ``split_factor``; the new slot's mean is sampled
    from the original gaussian (matching 3DGS's sampled splits; we keep
    the original's mean rather than resampling both, a common
    simplification).

The viewspace gradient signal comes from differentiating the render w.r.t.
an all-zero pixel-space offset on the projected means
(ops/projection.py ``screen_offset``) — the exact quantity 3DGS
accumulates, not a world-space proxy.

The single-host Trainer drives densification end-to-end
(train/trainer.py). Under the (data x tile) mesh the pool is replicated
like the model and ``densify_prune_step`` is a pure function of psum'd
gradients: build the parallel step with ``with_viewspace_grad=True``
(parallel/shard.py) and feed each camera's row of its per-view [B, N, 2]
output through :func:`accumulate` — identical counting to the single-host
path at any dp width.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.config import DensifyConfig
from gsplat_tpu.models.gaussians import (
    DEAD_OPACITY_LOGIT,
    GaussianModel,
    pad_model,
)
from gsplat_tpu.ops.quaternion import (
    normalize_quaternion,
    quaternion_to_rotation_matrix,
)

# A slot counts as alive while its raw logit is above this; prune writes
# DEAD_OPACITY_LOGIT and all pool padding starts there.
_ALIVE_THRESHOLD = DEAD_OPACITY_LOGIT + 1.0


class DensifyState(NamedTuple):
    """Per-slot viewspace-gradient accumulator between densify passes."""

    grad_sum: jnp.ndarray  # [C] sum of per-step viewspace grad norms
    grad_count: jnp.ndarray  # [C] steps the gaussian was visible/updated
    max_radius: jnp.ndarray  # [C] max projected radius (px) over the window
    #   (3DGS's max_radii2D, tracked per densify window instead of globally —
    #   every view is visited between passes at the default cadence, so the
    #   window max sees the same worst-case footprint)

    @staticmethod
    def zero(capacity: int) -> "DensifyState":
        return DensifyState(
            grad_sum=jnp.zeros((capacity,), jnp.float32),
            grad_count=jnp.zeros((capacity,), jnp.int32),
            max_radius=jnp.zeros((capacity,), jnp.float32),
        )


def alive_mask(model: GaussianModel) -> jnp.ndarray:
    return model.opacity_logits > _ALIVE_THRESHOLD


def num_alive(model: GaussianModel) -> jnp.ndarray:
    return jnp.sum(alive_mask(model).astype(jnp.int32))


def pool_capacity(n_initial: int, cfg: DensifyConfig) -> int:
    """Round the pool up to a multiple of 256 rows (keeps sort/pad shapes
    friendly; capacity is a one-time compile-shape choice)."""
    cap = int(n_initial * cfg.pool_factor)
    return max(-(-cap // 256) * 256, 256)


def init_pool(model: GaussianModel, cfg: DensifyConfig) -> GaussianModel:
    return pad_model(model, pool_capacity(model.num_gaussians, cfg))


def screen_radii(conics: jnp.ndarray, active: jnp.ndarray) -> jnp.ndarray:
    """Projected splat radius in pixels, 3DGS's ``max_radii2D`` quantity:
    ``ceil(3 * sqrt(max eigenvalue of the 2D covariance))``
    (gaussian-splatting's forward.cu; the reference computes the same
    eigenvalue for its bbox, rasterize.py:163-181). Recovered here from the
    conic — the covariance *inverse* (rasterize.py:189-199) — via
    ``max_eig(cov) = 1 / min_eig(conic)``. Inactive / degenerate (det <= 0)
    splats report radius 0."""
    from gsplat_tpu.config import GAUSSIAN_SPREAD

    cx, cy, cxy = conics[:, 0], conics[:, 1], conics[:, 2]
    half_tr = 0.5 * (cx + cy)
    det = cx * cy - cxy * cxy
    disc = jnp.sqrt(jnp.maximum(half_tr * half_tr - det, 0.0))
    min_eig = half_tr - disc
    ok = active & (min_eig > 0.0)
    r = GAUSSIAN_SPREAD * jnp.sqrt(1.0 / jnp.maximum(min_eig, 1e-30))
    return jnp.where(ok, jnp.ceil(r), 0.0)


def accumulate(
    state: DensifyState,
    screen_grad: jnp.ndarray,
    width: int,
    height: int,
    radii: jnp.ndarray | None = None,
) -> DensifyState:
    """Fold one step's viewspace gradient ([C, 2], from the zero-offset
    probe) into the accumulator. Only gaussians that received any gradient
    count toward the mean (3DGS counts visibility the same way).

    The probe differentiates w.r.t. *pixel-space* offsets, whose gradients
    are W/2 (H/2) times smaller than the NDC-scale gradients 3DGS's
    ``grad_threshold`` convention (default 2e-4) applies to (pix =
    (ndc+1)*W/2, so dL/d_ndc = dL/d_pix * W/2 — the 0.5*W factor in the
    CUDA backward). Rescale per axis so the standard threshold works.
    """
    gx = screen_grad[:, 0] * (0.5 * width)
    gy = screen_grad[:, 1] * (0.5 * height)
    norm = jnp.sqrt(gx * gx + gy * gy)
    seen = norm > 0.0
    return DensifyState(
        grad_sum=state.grad_sum + norm,
        grad_count=state.grad_count + seen.astype(jnp.int32),
        max_radius=(
            state.max_radius
            if radii is None
            else jnp.maximum(state.max_radius, radii)
        ),
    )


@partial(jax.jit, static_argnames=("cfg",))
def densify_prune_step(
    model: GaussianModel,
    state: DensifyState,
    key: jax.Array,
    scene_extent,
    cfg: DensifyConfig,
    step=0,
) -> Tuple[GaussianModel, jnp.ndarray, dict]:
    """One clone/split/prune pass over the pool. Returns
    (model, touched [C] bool, stats); stats values are device scalars.

    The prune criterion is the full 3DGS rule (densify_and_prune):
    low opacity always; past ``cfg.size_prune_start`` (and with
    ``cfg.max_screen_size > 0``) additionally any gaussian whose largest
    world-space scale exceeds ``prune_scale_extent * scene_extent`` or
    whose max projected radius over the window (``state.max_radius``, fed
    by the trainers' per-step ``screen_radii``) exceeds
    ``max_screen_size`` pixels."""
    c = model.num_gaussians
    i32 = jnp.int32
    iota = jnp.arange(c, dtype=i32)

    alive = alive_mask(model)
    opacity = jax.nn.sigmoid(model.opacity_logits)
    max_scale = jnp.exp(jnp.max(model.log_scales, axis=-1))
    prune = alive & (opacity < cfg.min_opacity)
    if cfg.max_screen_size > 0:
        size_active = jnp.asarray(step) >= cfg.size_prune_start
        big_ws = max_scale > cfg.prune_scale_extent * scene_extent
        big_vs = state.max_radius > cfg.max_screen_size
        prune = prune | (size_active & alive & (big_ws | big_vs))
    alive = alive & ~prune
    opacity_logits = jnp.where(prune, DEAD_OPACITY_LOGIT, model.opacity_logits)

    avg_grad = state.grad_sum / jnp.maximum(state.grad_count, 1)
    want = alive & (state.grad_count > 0) & (avg_grad >= cfg.grad_threshold)
    is_split = want & (max_scale > cfg.percent_dense * scene_extent)

    # Match the i-th best candidate with the i-th free slot: two
    # value-carrying sorts, then masked row writes — no dynamic shapes.
    free = ~alive
    n_free = jnp.sum(free.astype(i32))
    n_want = jnp.sum(want.astype(i32))
    k = jnp.minimum(n_free, n_want)

    _, free_slots = jax.lax.sort(((~free).astype(i32), iota), num_keys=1)
    _, cand_slots = jax.lax.sort(
        (jnp.where(want, -avg_grad, jnp.inf), iota), num_keys=1
    )
    take = iota < k  # the i-th (candidate, free-slot) pairing is active
    src = cand_slots
    dst = jnp.where(take, free_slots, c)  # out-of-range rows drop

    # New-slot parameters, gathered from the source candidates.
    src_split = is_split[src]
    shrink = jnp.where(src_split, -math.log(cfg.split_factor), 0.0)
    new_log_scales = model.log_scales[src] + shrink[:, None]
    # Split sample: mean drawn from the source gaussian N(mean, RSS^T R^T),
    # i.e. mean + R @ (scale * eps). Clones keep the exact mean.
    eps = jax.random.normal(key, (c, 3), model.means.dtype)
    scaled = jnp.exp(model.log_scales[src]) * eps
    rot = quaternion_to_rotation_matrix(normalize_quaternion(model.quats[src]))
    offset = jnp.einsum("nij,nj->ni", rot, scaled)
    new_means = model.means[src] + jnp.where(src_split[:, None], offset, 0.0)

    def write(rows, base):
        return base.at[dst].set(rows, mode="drop")

    new_model = GaussianModel(
        means=write(new_means, model.means),
        log_scales=write(new_log_scales, model.log_scales),
        quats=write(model.quats[src], model.quats),
        opacity_logits=write(model.opacity_logits[src], opacity_logits),
        sh=write(model.sh[src], model.sh),
    )
    # The split ORIGINAL shrinks too (its slot keeps its mean) — but only
    # if its new half actually got a free slot: the i-th candidate is
    # placed iff i < k.
    placed = jnp.zeros((c,), bool).at[jnp.where(take, src, c)].set(
        True, mode="drop"
    )
    shrink_orig = is_split & placed
    new_model = GaussianModel(
        means=new_model.means,
        log_scales=jnp.where(
            shrink_orig[:, None],
            new_model.log_scales - math.log(cfg.split_factor),
            new_model.log_scales,
        ),
        quats=new_model.quats,
        opacity_logits=new_model.opacity_logits,
        sh=new_model.sh,
    )

    # Rows whose parameters (or liveness) changed: the trainer zeroes their
    # optimizer moments (a reused slot must not inherit stale Adam state).
    touched = prune | shrink_orig
    touched = touched.at[jnp.where(take, free_slots, c)].set(True, mode="drop")

    stats = {
        "pruned": jnp.sum(prune.astype(i32)),
        "cloned": jnp.sum((placed & ~is_split).astype(i32)),
        "split": jnp.sum((placed & is_split).astype(i32)),
        "wanted": n_want,
        "alive": num_alive(new_model),
    }
    return new_model, touched, stats


def reset_opacity(model: GaussianModel, ceiling: float = 0.01) -> GaussianModel:
    """3DGS opacity reset: clamp every live gaussian's opacity to
    <= ``ceiling`` (stale occluders must re-earn their opacity)."""
    cap = math.log(ceiling) - math.log1p(-ceiling)  # logit(ceiling)
    alive = alive_mask(model)
    logits = jnp.where(
        alive, jnp.minimum(model.opacity_logits, cap), model.opacity_logits
    )
    return GaussianModel(
        means=model.means,
        log_scales=model.log_scales,
        quats=model.quats,
        opacity_logits=logits,
        sh=model.sh,
    )


def reset_opt_rows(opt_state, mask: jnp.ndarray):
    """Zero the optimizer-moment rows of re-allocated slots (a reused slot
    must not inherit the dead gaussian's Adam moments). Applies to every
    state leaf whose leading dimension matches the pool."""
    c = mask.shape[0]

    def fix(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == c:
            expand = mask.reshape((c,) + (1,) * (leaf.ndim - 1))
            return jnp.where(expand, jnp.zeros_like(leaf), leaf)
        return leaf

    return jax.tree.map(fix, opt_state)


def camera_extent(cameras: Sequence) -> float:
    """3DGS scene extent: 1.1x the radius of the camera-position cloud."""
    centers = []
    for cam in cameras:
        q = np.asarray(cam.qvec, np.float64)
        q = q / np.linalg.norm(q)
        w, x, y, z = q
        r = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ]
        )
        centers.append(-r.T @ np.asarray(cam.tvec, np.float64))
    centers = np.stack(centers)
    center = centers.mean(axis=0)
    radius = float(np.linalg.norm(centers - center, axis=1).max())
    return 1.1 * max(radius, 1e-6)


def compact(model: GaussianModel) -> GaussianModel:
    """Drop dead slots (host-side; for checkpoint export)."""
    keep = np.asarray(alive_mask(model))
    arrays = model.to_arrays()
    return GaussianModel.from_arrays({k: v[keep] for k, v in arrays.items()})
