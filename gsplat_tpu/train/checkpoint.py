"""Checkpointing: Inria-layout PLY export/import + orbax full-state save.

The reference only *loads* ``point_cloud/iteration_{k}/point_cloud.ply``
(rasterize.py:351-353) and never writes one (SURVEY.md §5.4). Here:
  * :func:`save_ply_checkpoint` / :func:`load_ply_checkpoint` round-trip the
    model through the exact Inria field layout, so checkpoints written by
    this framework load in the reference (and vice versa);
  * :func:`save_train_state` / :func:`restore_train_state` persist model +
    optimizer state with orbax for resumable fine-tuning.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

from gsplat_tpu.io.ply import load_splat_arrays, save_splat_arrays
from gsplat_tpu.io.scene import checkpoint_ply_path
from gsplat_tpu.models.gaussians import GaussianModel


def save_ply_checkpoint(model_dir: str, model: GaussianModel, iteration: int) -> str:
    """Write the model as ``<dir>/point_cloud/iteration_{k}/point_cloud.ply``."""
    path = checkpoint_ply_path(model_dir, iteration)
    save_splat_arrays(path, model.to_arrays())
    return path


def load_ply_checkpoint(model_dir: str, iteration: int = 30000) -> GaussianModel:
    return GaussianModel.from_arrays(
        load_splat_arrays(checkpoint_ply_path(model_dir, iteration))
    )


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(path: str, model: GaussianModel, opt_state, step: int) -> None:
    """Persist (model params, optimizer state, step) with orbax."""
    payload = {
        "model": model.to_arrays(),
        "opt_state": jax.tree.map(lambda x: x, opt_state),
        "step": step,
    }
    _checkpointer().save(os.path.abspath(path), payload, force=True)


def restore_train_state(
    path: str, opt_state_template=None
) -> Tuple[GaussianModel, Optional[object], int]:
    restored = _checkpointer().restore(os.path.abspath(path))
    model = GaussianModel.from_arrays(restored["model"])
    opt_state = restored["opt_state"]
    if opt_state_template is not None:
        opt_state = jax.tree.unflatten(
            jax.tree.structure(opt_state_template), jax.tree.leaves(opt_state)
        )
    return model, opt_state, int(restored["step"])
