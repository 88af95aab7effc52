"""Multi-chip rendering and training over a (data x tile) device mesh."""

from gsplat_tpu.parallel.mesh import (
    DATA_AXIS,
    TILE_AXIS,
    initialize_distributed,
    make_mesh,
)
from gsplat_tpu.parallel.shard import (
    ParallelTrainer,
    make_batch_render,
    make_parallel_train_step,
    make_sharded_binning_stats,
    make_sharded_render,
)

__all__ = [
    "DATA_AXIS",
    "TILE_AXIS",
    "ParallelTrainer",
    "initialize_distributed",
    "make_mesh",
    "make_batch_render",
    "make_parallel_train_step",
    "make_sharded_binning_stats",
    "make_sharded_render",
]
