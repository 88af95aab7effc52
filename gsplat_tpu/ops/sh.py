"""Spherical-harmonics -> RGB evaluation (degrees 0-3), pure jnp.

Parity target: reference ``spherical_harmonics.py:27-73``: view direction is
``normalize(mean - cam_center)``, hardcoded real cartesian SH bases, a +0.5
offset and a clamp to [0, 1]. Color is evaluated once per gaussian per view
(rasterize.py:368), not per pixel.

The evaluation is expressed as a single ``[N, 16] @ [N, 16, 3]`` contraction
(an einsum) so XLA maps it onto batched MXU work instead of 16 separate
fused multiply-adds.
"""

from __future__ import annotations

import jax.numpy as jnp

# Real SH constants (spherical_harmonics.py:4-24).
SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def sh_basis(dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Evaluate the real SH basis (with the reference's sign conventions) at
    unit directions ``[N, 3]`` -> ``[N, (degree+1)**2]``.

    Coefficient order matches the Inria PLY layout consumed by the reference
    (band-major: [dc, deg1 x3, deg2 x5, deg3 x7]).
    """
    n = dirs.shape[0]
    one = jnp.ones((n,), dtype=dirs.dtype)
    cols = [SH_C0 * one]
    if degree > 0:
        x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
        cols += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
        if degree > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            cols += [
                SH_C2[0] * xy,
                SH_C2[1] * yz,
                SH_C2[2] * (2.0 * zz - xx - yy),
                SH_C2[3] * xz,
                SH_C2[4] * (xx - yy),
            ]
            if degree > 2:
                cols += [
                    SH_C3[0] * y * (3.0 * xx - yy),
                    SH_C3[1] * xy * z,
                    SH_C3[2] * y * (4.0 * zz - xx - yy),
                    SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
                    SH_C3[4] * x * (4.0 * zz - xx - yy),
                    SH_C3[5] * z * (xx - yy),
                    SH_C3[6] * x * (xx - 3.0 * yy),
                ]
    return jnp.stack(cols, axis=-1)


def sh_to_rgb(
    means: jnp.ndarray,
    sh_coeffs: jnp.ndarray,
    cam_center: jnp.ndarray,
    degree: int = 3,
    clamp: bool = True,
) -> jnp.ndarray:
    """View-dependent color for each gaussian.

    Args:
      means: ``[N, 3]`` world-space gaussian centers.
      sh_coeffs: ``[N, 16, 3]`` SH coefficients (Inria layout, utils.py:21-31).
      cam_center: ``[3]`` world-space camera position.
      degree: SH degree in [0, 3]; the reference always renders with 3
        (rasterize.py:368).
      clamp: apply the +0.5 offset's companion clamp to [0, 1]
        (spherical_harmonics.py:69-71). Training may want clamp=False plus a
        downstream max(0, .) to keep gradients alive; the default matches the
        reference.

    Returns:
      ``[N, 3]`` RGB.
    """
    if not 0 <= degree <= 3:
        raise ValueError(f"SH degree must be in [0, 3], got {degree}")
    dirs = means - cam_center[None, :]
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    basis = sh_basis(dirs, degree)  # [N, B]
    num_bases = basis.shape[-1]
    colors = jnp.einsum(
        "nb,nbc->nc", basis, sh_coeffs[:, :num_bases, :], precision="highest"
    )
    colors = colors + 0.5
    if clamp:
        colors = jnp.clip(colors, 0.0, 1.0)
    return colors
