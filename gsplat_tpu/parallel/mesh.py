"""Device-mesh construction for multi-chip rendering/training.

The reference has no distributed code at all (SURVEY.md §2.3); scaling here
is TPU-native: a 2-D ``jax.sharding.Mesh`` with axes

  * ``data`` — camera/frame batch (data parallelism),
  * ``tile`` — framebuffer tiles (the rendering analogue of
    sequence/context parallelism: each device owns a slab of tiles and
    composites front-to-back locally; tiles are independent given the
    replicated gaussian set, so the forward needs no cross-device traffic
    and the backward needs exactly one psum of parameter gradients).

Collectives ride ICI within a slice; across hosts, initialize
``jax.distributed`` before building the mesh (multihost_utils helpers
below).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gsplat_tpu.config import MeshConfig

DATA_AXIS = "data"
TILE_AXIS = "tile"


def make_mesh(cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data x tile) mesh from the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    need = cfg.data * cfg.tile
    if len(devices) < need:
        raise ValueError(f"mesh {cfg} needs {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(cfg.data, cfg.tile)
    return Mesh(grid, axis_names=(DATA_AXIS, TILE_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(MeshConfig(data=1, tile=1))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up: call once per process before building the mesh.

    Thin wrapper over ``jax.distributed.initialize`` with clean error
    surfacing (SURVEY.md §5.3 — the only multi-host hygiene the north star
    requires)."""
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as exc:  # pragma: no cover - depends on cluster env
        raise RuntimeError(
            "jax.distributed.initialize failed — check coordinator address, "
            f"process count and process id: {exc}"
        ) from exc
