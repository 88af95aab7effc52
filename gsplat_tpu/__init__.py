"""gsplat_tpu: a TPU-native Gaussian Splatting framework (JAX/Pallas).

A from-scratch re-design of ``arnaudstiegler/torch-gaussian-splatting-
rasterizer`` for TPU: the reference's sequential per-gaussian torch loop
becomes a tile-parallel rasterizer (static-shape binning + Pallas
compositing kernels with a full custom VJP), plus the training loop,
checkpointing, CLI and multi-chip sharding the reference lacks.
"""

from gsplat_tpu.config import DensifyConfig, MeshConfig, RasterConfig, TrainConfig
from gsplat_tpu.models.gaussians import GaussianModel, random_model
from gsplat_tpu.ops.camera import CameraArrays, CameraParams
from gsplat_tpu.render.pipeline import (
    binning_stats,
    render,
    render_batch,
    render_depth,
    render_reference_oracle,
    render_traced,
    suggest_max_pairs,
)

__version__ = "0.3.0"

__all__ = [
    "CameraArrays",
    "CameraParams",
    "DensifyConfig",
    "GaussianModel",
    "MeshConfig",
    "RasterConfig",
    "TrainConfig",
    "binning_stats",
    "random_model",
    "render",
    "render_batch",
    "render_depth",
    "render_reference_oracle",
    "render_traced",
    "suggest_max_pairs",
]
