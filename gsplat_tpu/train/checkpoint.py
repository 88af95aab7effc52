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


def save_train_state(
    path: str, model: GaussianModel, opt_state, step: int, extras: Optional[dict] = None
) -> None:
    """Persist (model params, optimizer state, step) with orbax.

    ``step`` is the next step to run on resume. ``extras``: optional dict of
    extra arrays/scalars (the trainers stash densification state here) —
    values must be orbax-serializable (arrays, ints, nested dicts).
    """
    payload = {
        # Optimizer state rides as an ORDERED leaves list: orbax round-trips
        # pytrees through nested dicts whose restore order is key-sorted, and
        # an order-based unflatten would silently swap same-shaped leaves
        # between parameter groups (means/log_scales Adam moments are both
        # [N, 3]). A list preserves order exactly.
        "model": model.to_arrays(),
        "opt_leaves": list(jax.tree.leaves(opt_state)),
        "step": step,
        "extras": extras if extras is not None else {},
    }
    _checkpointer().save(os.path.abspath(path), payload, force=True)


def restore_train_state(
    path: str, opt_state_template=None, with_extras: bool = False
):
    """Restore ``save_train_state`` output. Returns (model, opt_state, step)
    or, with ``with_extras``, (model, opt_state, step, extras).

    With ``opt_state_template`` (an optimizer state of the right shapes,
    e.g. ``optimizer.init(model)``) the optimizer state is rebuilt with the
    template's exact pytree structure; without it the ordered leaves list is
    returned."""
    restored = _checkpointer().restore(os.path.abspath(path))
    model = GaussianModel.from_arrays(restored["model"])
    opt_state = restored["opt_leaves"]
    if opt_state_template is not None:
        opt_state = _rebuild_opt_state(opt_state, opt_state_template)
    if with_extras:
        return model, opt_state, int(restored["step"]), restored.get("extras") or {}
    return model, opt_state, int(restored["step"])


def _rebuild_opt_state(leaves, template):
    """Ordered leaves list -> the template's pytree structure (dtype-cast to
    the template's leaves — orbax round-trips scalars as numpy values)."""
    import jax.numpy as jnp

    tleaves = jax.tree.leaves(template)
    if len(tleaves) != len(leaves):
        raise ValueError(
            f"checkpoint optimizer state has {len(leaves)} leaves, "
            f"template has {len(tleaves)} (different optimizer config?)"
        )
    return jax.tree.unflatten(
        jax.tree.structure(template),
        [jnp.asarray(l, t.dtype) for l, t in zip(leaves, tleaves)],
    )


# ---- Trainer loop state (Trainer.fit / ParallelTrainer.fit resume) ----

TRAIN_STATE_SUBDIR = "train_state"


def loop_state_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, TRAIN_STATE_SUBDIR)


def save_loop_state(
    checkpoint_dir: str,
    model: GaussianModel,
    opt_state,
    next_step: int,
    dstate=None,
    key=None,
) -> str:
    """Persist a trainer's full loop state at ``<dir>/train_state``:
    model (pool model when densifying), optimizer state, the next step to
    run, and — when densifying — the viewspace-gradient accumulator and the
    densify RNG key, so a resumed run replays the identical trajectory."""
    extras = {}
    if dstate is not None:
        extras["densify"] = {
            "grad_sum": dstate.grad_sum,
            "grad_count": dstate.grad_count,
            "max_radius": dstate.max_radius,
            "key_data": jax.random.key_data(key),
        }
    path = loop_state_path(checkpoint_dir)
    save_train_state(path, model, opt_state, next_step, extras)
    return path


def has_loop_state(checkpoint_dir: str) -> bool:
    return os.path.isdir(loop_state_path(checkpoint_dir))


def restore_loop_state(checkpoint_dir: str, make_opt_template):
    """Restore ``save_loop_state`` output.

    ``make_opt_template``: model -> optimizer-state template (the restored
    model's shapes fix the template, e.g. ``optimizer.init``). Returns
    (model, opt_state, next_step, dstate_or_None, key_or_None).
    """
    import jax.numpy as jnp

    model, leaves, step, extras = restore_train_state(
        loop_state_path(checkpoint_dir), with_extras=True
    )
    opt_state = _rebuild_opt_state(leaves, make_opt_template(model))
    dstate = key = None
    if "densify" in extras:
        from gsplat_tpu.train.densify import DensifyState

        d = extras["densify"]
        grad_sum = jnp.asarray(d["grad_sum"], jnp.float32)
        dstate = DensifyState(
            grad_sum=grad_sum,
            grad_count=jnp.asarray(d["grad_count"], jnp.int32),
            # Older checkpoints predate the screen-size prune accumulator.
            max_radius=(
                jnp.asarray(d["max_radius"], jnp.float32)
                if "max_radius" in d
                else jnp.zeros_like(grad_sum)
            ),
        )
        key = jax.random.wrap_key_data(jnp.asarray(d["key_data"]))
    return model, opt_state, step, dstate, key
