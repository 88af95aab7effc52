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

    @classmethod
    def from_points3d(
        cls,
        xyzs: np.ndarray,
        rgbs: np.ndarray,
        initial_opacity: float = 0.1,
        dtype=jnp.float32,
    ) -> "GaussianModel":
        """Initialize a trainable splat model from COLMAP SfM points — the
        3DGS train-from-scratch entry (the reference only *parses* points3D,
        data_reader.py:48-114, and never consumes them; this is the consumer).

        Recipe per the 3DGS paper's initialization:
          * means = the SfM point positions;
          * color: the degree-0 SH band is set so ``sh_to_rgb`` reproduces
            the point's RGB (``(rgb/255 - 0.5) / C0``; sh_to_rgb adds the
            +0.5 offset back, spherical_harmonics.py:69), higher bands zero;
          * scales: isotropic, std-dev = sqrt(mean squared distance to the
            3 nearest neighbours) (an estimate of local point spacing);
          * rotations: identity; opacity: sigmoid^-1(initial_opacity).
        """
        from gsplat_tpu.ops.sh import SH_C0

        xyz = jnp.asarray(xyzs, dtype)
        n = xyz.shape[0]
        rgb = jnp.asarray(rgbs, dtype) / 255.0
        sh = jnp.zeros((n, 16, 3), dtype)
        sh = sh.at[:, 0, :].set((rgb - 0.5) / SH_C0)
        dist2 = jnp.maximum(knn_mean_sq_dist(xyz), 1e-7)
        log_scales = jnp.repeat(0.5 * jnp.log(dist2)[:, None], 3, axis=1)
        quats = jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype), (n, 1))
        logit = float(np.log(initial_opacity / (1.0 - initial_opacity)))
        return cls(
            means=xyz,
            log_scales=log_scales,
            quats=quats,
            opacity_logits=jnp.full((n,), logit, dtype),
            sh=sh,
        )


def knn_mean_sq_dist(xyz: jnp.ndarray, k: int = 3, chunk: int = 256) -> jnp.ndarray:
    """Mean squared distance from each point to its ``k`` nearest neighbours
    (excluding itself), [N]. Brute force in ``chunk``-point query blocks
    (each block is one [chunk, N] distance matrix — a few hundred MB at the
    ~100-500K points a COLMAP sparse reconstruction has; for much larger
    clouds subsample before calling)."""
    n = xyz.shape[0]
    k_eff = min(k + 1, n)  # +1: the query point itself is its own 0-distance NN
    if k_eff <= 1:
        return jnp.ones((n,), xyz.dtype)
    nblocks = -(-n // chunk)
    # Pad with +inf queries: their distances are inf everywhere, harmless.
    pad = jnp.full((nblocks * chunk - n, 3), jnp.inf, xyz.dtype)
    xyz_p = jnp.concatenate([xyz, pad], axis=0)

    def one_block(b):
        q = jax.lax.dynamic_slice_in_dim(xyz_p, b * chunk, chunk, axis=0)
        d2 = jnp.sum((q[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
        top, _ = jax.lax.top_k(-d2, k_eff)  # [chunk, k_eff], top[0] == self
        return -jnp.mean(top[:, 1:], axis=1)

    out = jax.lax.map(one_block, jnp.arange(nblocks))
    return out.reshape(-1)[:n]


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
