"""Image losses and quality metrics for splat fine-tuning.

The reference is inference-only (SURVEY.md §3.5); these cover the
backward-pass workload from BASELINE.json: L1 + D-SSIM loss (the standard
3DGS recipe) and PSNR for eval. SSIM uses the 11x11 gaussian window of the
original SSIM paper, implemented as two separable depthwise convolutions so
XLA fuses it into a handful of fused passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SSIM_WINDOW = 11
_SSIM_SIGMA = 1.5
_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def _gaussian_window(dtype) -> jnp.ndarray:
    half = (_SSIM_WINDOW - 1) / 2.0
    x = jnp.arange(_SSIM_WINDOW, dtype=dtype) - half
    w = jnp.exp(-(x * x) / (2.0 * _SSIM_SIGMA * _SSIM_SIGMA))
    return w / jnp.sum(w)


def _blur(img: jnp.ndarray) -> jnp.ndarray:
    """Separable 11x11 gaussian blur of [H, W, C] (reflect-free 'same' pad,
    matching the zero-padded conv used by the common torch SSIM impls)."""
    w = _gaussian_window(img.dtype)
    x = jnp.moveaxis(img, -1, 0)[:, None]  # [C, 1, H, W]
    kh = w.reshape(1, 1, _SSIM_WINDOW, 1)
    kw = w.reshape(1, 1, 1, _SSIM_WINDOW)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    pad_h = [(_SSIM_WINDOW // 2, _SSIM_WINDOW // 2), (0, 0)]
    pad_w = [(0, 0), (_SSIM_WINDOW // 2, _SSIM_WINDOW // 2)]
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), pad_h, dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), pad_w, dimension_numbers=dn)
    return jnp.moveaxis(x[:, 0], 0, -1)


def ssim(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean SSIM over an [H, W, C] image pair (values in [0, 1])."""
    mu_p = _blur(pred)
    mu_t = _blur(target)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t
    sigma_pp = _blur(pred * pred) - mu_pp
    sigma_tt = _blur(target * target) - mu_tt
    sigma_pt = _blur(pred * target) - mu_pt
    num = (2.0 * mu_pt + _C1) * (2.0 * sigma_pt + _C2)
    den = (mu_pp + mu_tt + _C1) * (sigma_pp + sigma_tt + _C2)
    return jnp.mean(num / den)


def rgb_loss(pred: jnp.ndarray, target: jnp.ndarray, ssim_weight: float) -> jnp.ndarray:
    """(1-w) * L1 + w * (1 - SSIM) — the 3DGS training loss."""
    if ssim_weight == 0.0:
        return l1_loss(pred, target)
    return (1.0 - ssim_weight) * l1_loss(pred, target) + ssim_weight * (
        1.0 - ssim(pred, target)
    )
