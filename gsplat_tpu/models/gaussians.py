"""The gaussian splat model: a JAX pytree of raw (pre-activation) params.

The parameterization mirrors the Inria PLY checkpoint semantics the
reference loads (SURVEY.md C6):
  * ``means``          [N, 3]  world-space centers (x, y, z).
  * ``log_scales``     [N, 3]  exp() -> per-axis std-devs (rasterize.py:97-99).
  * ``quats``          [N, 4]  unnormalized rotation quaternions, w-first;
                               normalized at use (rasterize.py:100-112).
  * ``opacity_logits`` [N]     sigmoid() -> opacity (rasterize.py:358).
  * ``sh``             [N, 16, 3] spherical-harmonics coefficients in the
                               Inria band-major layout (utils.py:21-31).

Keeping raw parameters (not activated values) is what makes the model
directly trainable: gradients flow through exp/sigmoid/normalize.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.ops.projection import covariance_from_scales_quats


@jax.tree_util.register_pytree_node_class
class GaussianModel:
    """Pytree container for splat parameters."""

    def __init__(self, means, log_scales, quats, opacity_logits, sh):
        self.means = means
        self.log_scales = log_scales
        self.quats = quats
        self.opacity_logits = opacity_logits
        self.sh = sh

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        leaves = (self.means, self.log_scales, self.quats, self.opacity_logits, self.sh)
        return leaves, None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    # -- derived quantities ---------------------------------------------------
    @property
    def num_gaussians(self) -> int:
        return self.means.shape[0]

    def scales(self) -> jnp.ndarray:
        return jnp.exp(self.log_scales)

    def opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity_logits)

    def covariances(self) -> jnp.ndarray:
        """[N, 3, 3] 3D covariances, Cov = (R S)(R S)^T (rasterize.py:89-120)."""
        return covariance_from_scales_quats(self.scales(), self.quats)

    def astype(self, dtype) -> "GaussianModel":
        return jax.tree.map(lambda x: x.astype(dtype), self)

    # -- numpy interchange (used by the PLY reader/writer) -------------------
    @classmethod
    def from_arrays(cls, arrays: Dict[str, np.ndarray], dtype=jnp.float32) -> "GaussianModel":
        return cls(
            means=jnp.asarray(arrays["means"], dtype),
            log_scales=jnp.asarray(arrays["log_scales"], dtype),
            quats=jnp.asarray(arrays["quats"], dtype),
            opacity_logits=jnp.asarray(arrays["opacity_logits"], dtype),
            sh=jnp.asarray(arrays["sh"], dtype),
        )

    def to_arrays(self) -> Dict[str, np.ndarray]:
        return {
            "means": np.asarray(self.means),
            "log_scales": np.asarray(self.log_scales),
            "quats": np.asarray(self.quats),
            "opacity_logits": np.asarray(self.opacity_logits),
            "sh": np.asarray(self.sh),
        }

    def __repr__(self) -> str:
        return f"GaussianModel(num_gaussians={self.means.shape[0]})"


DEAD_OPACITY_LOGIT = -30.0
# sigmoid(-30) ~ 9e-14: far below the 1/255 alpha gate, so a dead slot's
# alpha-cull rect is empty and it can never emit a (tile, gaussian) pair.


def pad_model(
    model: GaussianModel, total: int, dead_logit: float = DEAD_OPACITY_LOGIT
) -> GaussianModel:
    """Pad the gaussian axis to ``total`` rows with inert splats (identity
    quats keep every preprocess intermediate finite). Used by tile shards
    (equal slice sizes) and the densification pool (free slots)."""
    n = model.num_gaussians
    extra = total - n
    if extra == 0:
        return model
    pad_quats = jnp.tile(
        jnp.asarray([1.0, 0.0, 0.0, 0.0], model.quats.dtype), (extra, 1)
    )

    def pad(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((extra,) + x.shape[1:], fill, x.dtype)], axis=0
        )

    return GaussianModel(
        means=pad(model.means),
        log_scales=pad(model.log_scales),
        quats=jnp.concatenate([model.quats, pad_quats], axis=0),
        opacity_logits=pad(model.opacity_logits, dead_logit),
        sh=pad(model.sh),
    )


def random_model(key: jax.Array, n: int, extent: float = 1.0) -> GaussianModel:
    """Random splat model for tests/benchmarks."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return GaussianModel(
        means=jax.random.uniform(k1, (n, 3), minval=-extent, maxval=extent),
        log_scales=jax.random.uniform(k2, (n, 3), minval=-5.0, maxval=-2.0),
        quats=jax.random.normal(k3, (n, 4)),
        opacity_logits=jax.random.uniform(k4, (n,), minval=-2.0, maxval=3.0),
        sh=jax.random.normal(k5, (n, 16, 3)) * 0.3,
    )
