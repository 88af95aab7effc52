"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding logic is tested on a virtual CPU mesh (SURVEY.md §4d);
benchmarks run separately on real TPU hardware via bench.py. The override
must be unconditional — the ambient environment may point JAX_PLATFORMS at
a TPU tunnel, where f32 matmuls run as bf16 passes and parity tolerances
would silently loosen.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment ships a site config that pins jax_platforms to the TPU
# tunnel ("axon,cpu"), overriding the env var — force it back explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
