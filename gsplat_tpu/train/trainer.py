"""Fine-tuning loop: optimize splat parameters against ground-truth views.

Covers BASELINE.json config 4 ("optimize means/opacity/SH of a pretrained
scene against held-out views, full VJP"). The reference has no trainer at
all; this one follows the 3DGS recipe: per-parameter learning rates, Adam,
L1 + D-SSIM loss, all under one jitted train step so render-forward,
kernel-backward, and the optimizer update fuse into a single device program.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gsplat_tpu.config import RasterConfig, TrainConfig
from gsplat_tpu.models.gaussians import GaussianModel
from gsplat_tpu.ops.camera import CameraArrays, CameraParams
from gsplat_tpu.render.pipeline import render_traced
from gsplat_tpu.train.loss import psnr, rgb_loss
from gsplat_tpu.utils.logging import get_logger
from gsplat_tpu.utils.progress import progress

logger = get_logger()


def scene_extent(cameras) -> float:
    """3DGS's ``spatial_lr_scale`` (the Inria trainer's getNerfppNorm):
    1.1x the radius of the camera-center bounding sphere around the
    centroid. The 3DGS position-lr defaults (1.6e-4 decaying to 1.6e-6)
    are calibrated to be *multiplied by this* on real scenes. The torch
    reference has no trainer (rasterize.py is inference-only), so the
    scale is an explicit helper + CLI flag (``--lr-scale-extent``) rather
    than something silently applied."""
    from gsplat_tpu.ops.camera import camera_center

    centers = np.stack(
        [np.asarray(camera_center(cam.matrices()[0])) for cam in cameras]
    )
    radius = float(
        np.linalg.norm(centers - centers.mean(axis=0), axis=1).max()
    )
    return 1.1 * max(radius, 1e-6)


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    """Adam with the 3DGS per-parameter learning rates, expressed as an
    optax multi_transform over the GaussianModel pytree.

    With ``lr_means_decay_steps > 0`` the means' learning rate follows the
    3DGS position schedule — log-linear decay from ``lr_means`` to
    ``lr_means_final`` over that many updates, clamped thereafter (the
    exp-of-lerped-logs helper in the Inria trainer; the reference itself
    has no optimizer, rasterize.py is inference-only)."""
    lr_means = tc.lr_means
    if tc.lr_means_decay_steps > 0:
        if not 0.0 < tc.lr_means_final <= tc.lr_means:
            raise ValueError(
                "lr_means_final must be in (0, lr_means] when "
                f"lr_means_decay_steps > 0, got {tc.lr_means_final}"
            )
        lr_means = optax.exponential_decay(
            init_value=tc.lr_means,
            transition_steps=tc.lr_means_decay_steps,
            decay_rate=tc.lr_means_final / tc.lr_means,
            end_value=tc.lr_means_final,
        )
    labels = GaussianModel(
        means="means",
        log_scales="log_scales",
        quats="quats",
        opacity_logits="opacity_logits",
        sh="sh",
    )
    return optax.multi_transform(
        {
            "means": optax.adam(lr_means),
            "log_scales": optax.adam(tc.lr_scales),
            "quats": optax.adam(tc.lr_quats),
            "opacity_logits": optax.adam(tc.lr_opacity),
            "sh": optax.adam(tc.lr_sh),
        },
        labels,
    )


@dataclasses.dataclass
class Trainer:
    """Single-host trainer. For multi-chip training see
    gsplat_tpu.parallel.shard.make_parallel_train_step.

    ``auto_pairs``: the pair buffer has static capacity
    (``raster.max_pairs``); a denser scene would silently drop its deepest
    splats (ops/binning.py overflow policy) and train on a truncated scene.
    ``fit`` therefore checks the measured pair demand on its first step and
    every ``log_every`` steps (splats grow during training); on overflow it
    warns and — when ``auto_pairs`` — resizes the budget to the next power
    of two above ``demand * 1.5`` (one recompile per resize).
    """

    raster: RasterConfig
    train: TrainConfig
    auto_pairs: bool = True
    show_progress: bool = True

    def __post_init__(self):
        if self.train.background not in ("black", "white", "random"):
            raise ValueError(
                f"TrainConfig.background must be black|white|random, "
                f"got {self.train.background!r}"
            )
        self._bg_rng = np.random.default_rng(0)
        self.optimizer = make_optimizer(self.train)

        # The camera pose is traced data (CameraArrays), so ONE compile per
        # (image size, raster config) serves every view — a static
        # CameraParams would retrace the whole pipeline for each pose.
        @partial(jax.jit, static_argnames=("width", "height", "cfg"))
        def _step(model, opt_state, cam, target, bg, width, height, cfg):
            def loss_fn(m):
                image, trans = render_traced(m, cam, width, height, cfg)
                image = image + trans[..., None] * bg
                return rgb_loss(image, target, self.train.ssim_weight), image

            (loss, image), grads = jax.value_and_grad(loss_fn, has_aux=True)(model)
            updates, opt_state = self.optimizer.update(grads, opt_state, model)
            model = optax.apply_updates(model, updates)
            metrics = {"loss": loss, "psnr": psnr(image, target)}
            return model, opt_state, metrics

        self._step = _step

        # Densifying variant: the loss is additionally differentiated w.r.t.
        # an all-zero pixel-space offset on the projected means — the exact
        # viewspace gradient 3DGS's densification heuristic accumulates.
        # Also returns this view's projected radii (3DGS max_radii2D input
        # for the screen-size prune); the extra preprocess on the pre-update
        # model CSEs with the render's own inside the same jit.
        @partial(jax.jit, static_argnames=("width", "height", "cfg"))
        def _step_vs(model, opt_state, cam, target, bg, width, height, cfg):
            from gsplat_tpu.render.pipeline import preprocess_traced
            from gsplat_tpu.train import densify as D

            offset = jnp.zeros((model.num_gaussians, 2), model.means.dtype)

            def loss_fn(m, off):
                image, trans = render_traced(m, cam, width, height, cfg, off)
                image = image + trans[..., None] * bg
                return rgb_loss(image, target, self.train.ssim_weight), image

            (loss, image), (grads, vs_grad) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(model, offset)
            prep = preprocess_traced(model, cam, width, height, cfg)
            radii = D.screen_radii(prep.conics, prep.active)
            updates, opt_state = self.optimizer.update(grads, opt_state, model)
            model = optax.apply_updates(model, updates)
            metrics = {"loss": loss, "psnr": psnr(image, target)}
            return model, opt_state, metrics, vs_grad, radii

        self._step_vs = _step_vs

    def init_state(self, model: GaussianModel):
        return self.optimizer.init(model)

    def draw_background(self) -> jnp.ndarray:
        """This step's background color [3] per ``TrainConfig.background``
        ("random" draws a fresh color from the trainer's host RNG)."""
        if self.train.background == "white":
            return jnp.ones((3,), jnp.float32)
        if self.train.background == "random":
            return jnp.asarray(
                self._bg_rng.uniform(size=3).astype(np.float32)
            )
        return jnp.zeros((3,), jnp.float32)

    def train_step(
        self,
        model: GaussianModel,
        opt_state,
        camera: CameraParams,
        target: jnp.ndarray,
    ) -> Tuple[GaussianModel, object, Dict[str, jnp.ndarray]]:
        """One jitted optimization step against one view. Returns
        (model, opt_state, metrics)."""
        cam = CameraArrays.from_params(camera, dtype=model.means.dtype)
        return self._step(
            model, opt_state, cam, target, self.draw_background(),
            camera.width, camera.height, self.raster,
        )

    def check_capacity(
        self, model: GaussianModel, camera: CameraParams
    ) -> RasterConfig:
        """Warn on pair-buffer overflow for this (model, view); returns the
        (possibly resized, power-of-two) raster config. Also updates
        ``self.raster`` so subsequent steps use the new budget."""
        from gsplat_tpu.render.pipeline import binning_stats, required_max_pairs

        cam = CameraArrays.from_params(camera, dtype=model.means.dtype)
        stats = binning_stats(model, cam, camera.width, camera.height, self.raster)
        demand = int(stats["pair_demand"])
        if demand > self.raster.max_pairs:
            target = required_max_pairs(demand)
            if self.auto_pairs:
                logger.warning(
                    "pair buffer overflow (demand %d > capacity %d): resizing "
                    "max_pairs to %d (one recompile)",
                    demand, self.raster.max_pairs, target,
                )
                self.raster = dataclasses.replace(self.raster, max_pairs=target)
            else:
                logger.warning(
                    "pair buffer overflow (demand %d > capacity %d): the "
                    "deepest splats are being dropped — raise max_pairs "
                    "(suggested: %d) or enable auto_pairs",
                    demand, self.raster.max_pairs, target,
                )
        return self.raster

    def fit(
        self,
        model: GaussianModel,
        views: Sequence[Tuple[CameraParams, jnp.ndarray]],
        steps: Optional[int] = None,
        log_fn=None,
        checkpoint_dir: Optional[str] = None,
        resume: bool = False,
    ) -> Tuple[GaussianModel, List[Dict[str, float]]]:
        """Round-robin over (camera, ground-truth image) views.

        With ``train.densify`` set, the model moves into a fixed-capacity
        pool (train/densify.py), viewspace gradients are accumulated every
        step, and the clone/split/prune pass runs at the configured cadence;
        the returned model is compacted back to its live gaussians.

        With ``checkpoint_dir`` the full loop state (model, optimizer,
        step, densify accumulator + RNG) is saved to
        ``<dir>/train_state`` every ``train.checkpoint_every`` steps and at
        completion; ``resume=True`` restores it (if present) and continues
        from the saved step with the identical view rotation and RNG path,
        so an interrupted run reaches the same final parameters as an
        uninterrupted one. History covers only the resumed steps.
        """
        steps = steps if steps is not None else self.train.steps
        dc = self.train.densify
        dstate = key = None
        start_step = 0
        resumed = False
        if checkpoint_dir:
            from gsplat_tpu.train import checkpoint as CK
        if resume and checkpoint_dir and CK.has_loop_state(checkpoint_dir):
            model, opt_state, start_step, dstate, key = CK.restore_loop_state(
                checkpoint_dir, self.optimizer.init
            )
            resumed = True
            logger.info(
                "resumed from %s at step %d",
                CK.loop_state_path(checkpoint_dir), start_step,
            )
            if self.train.background == "random":
                # Replay the host RNG to the resume point so the background
                # sequence continues exactly where the killed run left off.
                for _ in range(start_step):
                    self._bg_rng.uniform(size=3)
        if dc is not None:
            from gsplat_tpu.train import densify as D

            extent = D.camera_extent([c for c, _ in views])
            if not resumed:
                model = D.init_pool(model, dc)
                dstate = D.DensifyState.zero(model.num_gaussians)
                key = jax.random.key(0)
        if not resumed:
            opt_state = self.init_state(model)
        history: List[Dict[str, float]] = []
        self.check_capacity(model, views[start_step % len(views)][0])
        for step in progress(
            range(start_step, steps), desc="finetune", enabled=self.show_progress
        ):
            camera, target = views[step % len(views)]
            # 3DGS SH warmup: view-dependent color detail is introduced
            # band by band (one recompile per degree bump).
            step_cfg = self.raster
            if self.train.sh_warmup_every > 0:
                deg = min(step // self.train.sh_warmup_every, self.raster.sh_degree)
                if deg != self.raster.sh_degree:
                    step_cfg = dataclasses.replace(self.raster, sh_degree=deg)
            cam = CameraArrays.from_params(camera, dtype=model.means.dtype)
            bg = self.draw_background()
            if dc is None:
                model, opt_state, metrics = self._step(
                    model, opt_state, cam, target, bg, camera.width,
                    camera.height, step_cfg,
                )
            else:
                model, opt_state, metrics, vs_grad, radii = self._step_vs(
                    model, opt_state, cam, target, bg, camera.width,
                    camera.height, step_cfg,
                )
                dstate = D.accumulate(
                    dstate, vs_grad, camera.width, camera.height, radii
                )
                in_window = dc.start <= step < dc.until
                if in_window and step > 0 and step % dc.every == 0:
                    key, sub = jax.random.split(key)
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
                    self.check_capacity(model, camera)
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
                if step > 0:  # splats grow during training; re-check budget
                    self.check_capacity(model, views[step % len(views)][0])
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
            # Final state (pre-compaction: the densify extras describe the
            # pool model) — a later `resume` with a higher step count
            # continues training from here.
            CK.save_loop_state(checkpoint_dir, model, opt_state, steps, dstate, key)
        if dc is not None:
            from gsplat_tpu.train import densify as D

            model = D.compact(model)
        return model, history
