"""Micro-benchmarks of the binning primitives on the current backend."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")


from timing import timed


def main():
    rng = np.random.default_rng(0)
    N = 1_000_000
    P = 1 << 22

    depth = jnp.asarray(rng.uniform(0, 10, N).astype(np.float32))
    keys4m = jnp.asarray(rng.integers(0, 2040, P).astype(np.int32))
    vals4m = jnp.asarray(rng.integers(0, N, P).astype(np.int32))

    t = timed(jax.jit(lambda d: jnp.argsort(d)), depth)
    print(f"argsort 1M f32:            {t*1e3:8.1f} ms", flush=True)

    t = timed(jax.jit(lambda k: jnp.argsort(k, stable=True)), keys4m)
    print(f"argsort 4M i32 stable:     {t*1e3:8.1f} ms", flush=True)

    t = timed(jax.jit(lambda k: jnp.argsort(k, stable=True)), keys4m[: P // 4])
    print(f"argsort 1M i32 stable:     {t*1e3:8.1f} ms", flush=True)

    t = timed(
        jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1, is_stable=True)),
        keys4m, vals4m,
    )
    print(f"lax.sort 4M (k,v) stable:  {t*1e3:8.1f} ms", flush=True)

    t = timed(jax.jit(jax.lax.cummax), keys4m)
    print(f"cummax 4M i32:             {t*1e3:8.1f} ms", flush=True)

    t = timed(jax.jit(jnp.cumsum), keys4m)
    print(f"cumsum 4M i32:             {t*1e3:8.1f} ms", flush=True)

    t = timed(jax.jit(lambda v, i: jnp.zeros((P,), jnp.int32).at[i].max(v, mode="drop")), vals4m, keys4m)
    print(f"scatter-max 4M:            {t*1e3:8.1f} ms", flush=True)

    t = timed(jax.jit(lambda v, i: v[i]), vals4m, keys4m)
    print(f"gather 4M (small range):   {t*1e3:8.1f} ms", flush=True)

    idx4m = jnp.asarray(rng.integers(0, P, P).astype(np.int32))
    t = timed(jax.jit(lambda v, i: v[i]), vals4m, idx4m)
    print(f"gather 4M (full range):    {t*1e3:8.1f} ms", flush=True)

    # MXU triangular-matmul cumulative-count primitive: [C,C] @ [C,T]
    C, T = 256, 2048
    tril = jnp.tril(jnp.ones((C, C), jnp.bfloat16), k=-1)
    cov = jnp.asarray(rng.integers(0, 2, (N // C, C, T)).astype(np.float32)).astype(jnp.bfloat16)

    def ranks(tril, cov):
        f = jax.vmap(lambda m: jax.lax.dot(tril, m, preferred_element_type=jnp.float32))
        return f(cov)

    t = timed(jax.jit(ranks), tril, cov)
    print(f"tril-matmul {N//C}x[{C},{C}]@[{C},{T}]: {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
