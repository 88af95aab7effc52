"""Sweep (tile_size, chunk_size) for the full fwd+bwd step on TPU."""

from __future__ import annotations

import math
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from timing import timed
from bench import NUM_GAUSSIANS, MAX_PAIRS, WIDTH, HEIGHT, build_scene
from gsplat_tpu import RasterConfig
from gsplat_tpu.ops.camera import CameraArrays, CameraParams
from gsplat_tpu.render.pipeline import render_traced
from gsplat_tpu.train.loss import rgb_loss


def main():
    model = build_scene(NUM_GAUSSIANS)
    fx = 0.8 * WIDTH
    camera = CameraParams(width=WIDTH, height=HEIGHT,
        fov_x=2*math.atan(WIDTH/(2*fx)), fov_y=2*math.atan(HEIGHT/(2*fx)),
        focal_x=fx, focal_y=fx, qvec=(1.0,0.0,0.0,0.0), tvec=(0.0,0.0,0.0))
    cam = CameraArrays.from_params(camera)
    target = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32) + 0.25

    for ts, cs in [(32, 32), (16, 32), (16, 64), (32, 16)]:
        cfg = RasterConfig(
            tile_size=ts, chunk_size=cs, max_pairs=MAX_PAIRS,
            early_stop_transmittance=1e-4, strict_parity=True, use_pallas=True,
        )

        @jax.jit
        def fwd_bwd(m, cam, target):
            def loss_fn(m):
                image, _ = render_traced(m, cam, WIDTH, HEIGHT, cfg)
                return rgb_loss(image, target, 0.2)
            return jax.value_and_grad(loss_fn)(m)

        try:
            t, (loss, _) = timed(fwd_bwd, model, cam, target, iters=5)
            print(f"tile={ts} chunk={cs}: fwd+bwd {t*1e3:7.1f} ms  loss={float(loss):.5f}", flush=True)
        except Exception as e:
            print(f"tile={ts} chunk={cs}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
