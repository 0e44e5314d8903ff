"""Test environment: force CPU with 8 virtual devices so multi-chip sharding
paths (Mesh / pjit / shard_map) are exercised without TPU hardware, and keep
matmuls at highest precision for bit-exactness tests."""

import os

# force CPU: the sandbox presets JAX_PLATFORMS=axon (single TPU chip behind a
# tunnel) which serializes across processes; unit tests must never touch it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the jaxtyping pytest plugin imports jax before this conftest runs, freezing
# the env-derived platform config — override it programmatically too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_threefry_partitionable", True)
