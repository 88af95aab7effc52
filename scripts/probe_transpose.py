"""On-chip probe: can Mosaic lower the in-kernel transposes the dense
(column-major) pair-slab layout needs?

  1. [16, 128] -> [128, 16]   (feature block after DMA-in)
  2. [128, 16] -> [16, 128]   (gradient block before DMA-out)
  3. block-indexed DMA from a [nblk, 16, 128] HBM slab

Fallback measured alongside: exact MXU transpose via eye() @ x at HIGHEST.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def t1_kernel(x_ref, o_ref):
    o_ref[...] = jnp.transpose(x_ref[...], (1, 0))


def t2_kernel(x_ref, o_ref):
    o_ref[...] = jnp.transpose(x_ref[...], (1, 0))


def mxu_t_kernel(x_ref, o_ref):
    # exact transpose via eye @ x on the MXU (HIGHEST = f32-exact)
    x = x_ref[...]  # [16, 128]
    eye = jnp.eye(128, dtype=jnp.float32)
    o_ref[...] = jax.lax.dot_general(
        eye, x, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def dma_kernel(x_hbm, o_ref, slab, sem):
    b = pl.program_id(0)
    cp = pltpu.make_async_copy(x_hbm.at[b], slab, sem)
    cp.start()
    cp.wait()
    o_ref[0] = jnp.transpose(slab[...], (1, 0))


def main():
    x = jnp.asarray(np.random.RandomState(0).randn(16, 128), jnp.float32)

    for name, kern in [("t1 jnp.transpose 16x128->128x16", t1_kernel),
                       ("mxu eye-transpose", mxu_t_kernel)]:
        try:
            out = pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((128, 16), jnp.float32)
            )(x)
            ok = np.array_equal(np.asarray(out), np.asarray(x).T)
            print(f"{name}: OK bitwise_equal={ok}")
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")

    y = jnp.asarray(np.random.RandomState(1).randn(128, 16), jnp.float32)
    try:
        out = pl.pallas_call(
            t2_kernel, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32)
        )(y)
        ok = np.array_equal(np.asarray(out), np.asarray(y).T)
        print(f"t2 jnp.transpose 128x16->16x128: OK bitwise_equal={ok}")
    except Exception as e:
        print(f"t2: FAIL {type(e).__name__}: {str(e)[:300]}")

    # block-indexed DMA from [nblk, 16, 128] in ANY/HBM space
    nblk = 4
    xb = jnp.asarray(np.random.RandomState(2).randn(nblk, 16, 128), jnp.float32)
    try:
        out = pl.pallas_call(
            dma_kernel,
            out_shape=jax.ShapeDtypeStruct((nblk, 128, 16), jnp.float32),
            grid=(nblk,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, 128, 16), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((16, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(xb)
        ok = np.array_equal(
            np.asarray(out), np.transpose(np.asarray(xb), (0, 2, 1))
        )
        print(f"dma block + transpose: OK bitwise_equal={ok}")
    except Exception as e:
        print(f"dma: FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
