"""Probe: DMA read/write of [16, 128] lane-slices of a [16, M] HBM array at
DYNAMIC 128-aligned lane offsets (the 2D dense-slab layout). If rejected,
fall back to the 3D [nblk, 16, 128] block layout."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(starts_ref, x_hbm, o_hbm, slab, insem, outsem):
    b = pl.program_id(0)
    off = starts_ref[b]
    cp = pltpu.make_async_copy(x_hbm.at[:, pl.ds(off, 128)], slab, insem)
    cp.start()
    cp.wait()
    slab[...] = slab[...] * 2.0
    cp2 = pltpu.make_async_copy(slab, o_hbm.at[:, pl.ds(off, 128)], outsem)
    cp2.start()
    cp2.wait()


def main():
    m = 512
    x = jnp.asarray(np.random.RandomState(0).randn(16, m), jnp.float32)
    starts = jnp.asarray([256, 0, 384, 128], jnp.int32)  # dynamic, 128-aligned
    try:
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(4,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[
                    pltpu.VMEM((16, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA,
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((16, m), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(starts, x)
        ok = np.allclose(np.asarray(out), np.asarray(x) * 2.0)
        print(f"2D dynamic lane-offset DMA: OK allclose={ok}")
    except Exception as e:
        print(f"2D dynamic lane-offset DMA: FAIL {type(e).__name__}: {str(e)[:400]}")


if __name__ == "__main__":
    main()
