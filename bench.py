"""Headline benchmark: forward+backward render rate at 1080p on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline (BASELINE.md): the torch reference renders one image in ~5 minutes
*forward-only* (README.md:5). We report full forward+backward (render +
loss + gradients to every splat parameter) frames/sec on one TPU chip;
``vs_baseline`` is the speedup over the reference's 1/300 fps.

The synthetic scene is sized to a realistic MipNeRF-360 workload: 1M
gaussians in the frustum, ~5M surviving tile pairs at 1920x1080.
"""

from __future__ import annotations

import json
import math
import sys
import time

import numpy as np

WIDTH, HEIGHT = 1920, 1080
NUM_GAUSSIANS = 1_000_000
# ~1.1M pairs survive binning for this scene; 2M capacity leaves 1.9x
# headroom while keeping the P-scale sort/scan/gather costs tight.
MAX_PAIRS = 1 << 21
BASELINE_FPS = 1.0 / 300.0  # reference: ~5 min per forward-only frame


def build_scene(n: int):
    import jax

    from gsplat_tpu.models.gaussians import GaussianModel

    rng = np.random.default_rng(0)
    # Fill the view frustum: camera at origin looking down +z, z in [2, 10].
    z = rng.uniform(2.0, 10.0, n).astype(np.float32)
    x = rng.uniform(-0.9, 0.9, n).astype(np.float32) * z
    y = rng.uniform(-0.55, 0.55, n).astype(np.float32) * z
    arrays = {
        "means": np.stack([x, y, z], -1),
        # small splats so the pair count stays realistic (~3-6 per gaussian)
        "log_scales": rng.uniform(-5.2, -3.6, (n, 3)).astype(np.float32),
        "quats": rng.normal(size=(n, 4)).astype(np.float32),
        "opacity_logits": rng.uniform(-2.0, 2.0, n).astype(np.float32),
        "sh": (rng.normal(size=(n, 16, 3)) * 0.2).astype(np.float32),
    }
    return GaussianModel.from_arrays(arrays)


def main():
    import jax
    import jax.numpy as jnp

    from gsplat_tpu import RasterConfig, TrainConfig
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.ops.camera import CameraArrays, CameraParams
    from gsplat_tpu.train.loss import rgb_loss
    from gsplat_tpu.render.pipeline import render_traced

    cfg = RasterConfig(
        tile_size=32,
        chunk_size=32,
        max_pairs=MAX_PAIRS,
        early_stop_transmittance=1e-4,
        strict_parity=True,
        use_pallas=jax.default_backend() == "tpu",
    )
    model = build_scene(NUM_GAUSSIANS)
    fx = 0.8 * WIDTH
    camera = CameraParams(
        width=WIDTH, height=HEIGHT,
        fov_x=2 * math.atan(WIDTH / (2 * fx)), fov_y=2 * math.atan(HEIGHT / (2 * fx)),
        focal_x=fx, focal_y=fx,
        qvec=(1.0, 0.0, 0.0, 0.0), tvec=(0.0, 0.0, 0.0),
    )
    cam = CameraArrays.from_params(camera)
    target = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32) + 0.25

    @jax.jit
    def fwd_bwd(m, cam, target):
        def loss_fn(m):
            image, _ = render_traced(m, cam, WIDTH, HEIGHT, cfg)
            return rgb_loss(image, target, 0.2)

        loss, grads = jax.value_and_grad(loss_fn)(m)
        return loss, grads

    # Warmup (compile) + steady-state timing. NOTE: on the tunneled TPU
    # backend block_until_ready can return before execution finishes; the
    # only reliable fence is a device->host fetch, so the timed window ends
    # with float(loss) of the LAST iteration (all prior iterations are
    # ordered before it on the single device stream).
    loss, grads = fwd_bwd(model, cam, target)
    assert np.isfinite(float(loss)), loss

    iters = 20
    start = time.perf_counter()
    for _ in range(iters):
        loss, grads = fwd_bwd(model, cam, target)
    final_loss = float(loss)
    elapsed = (time.perf_counter() - start) / iters

    fps = 1.0 / elapsed
    mpix_s = fps * (WIDTH * HEIGHT) / 1e6
    result = {
        "metric": "1080p_fwd+bwd_frames_per_sec_per_chip",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 1),
        "extra": {
            "mpixels_per_sec": round(mpix_s, 2),
            "num_gaussians": NUM_GAUSSIANS,
            "max_pairs": MAX_PAIRS,
            "backend": jax.default_backend(),
            "sec_per_frame": round(elapsed, 4),
            "loss": final_loss,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
