"""Test harness config: run on CPU with 8 virtual devices so sharding
tests exercise a real Mesh without TPU hardware (SURVEY.md §4
"distributed-without-cluster").  Must set env vars before jax import.
"""

import os

# Force-assign: the dev box exports JAX_PLATFORMS=axon (the TPU tunnel),
# which must not leak into unit tests — they run on the virtual 8-device
# CPU platform. TPU-hardware smoke tests opt back in explicitly.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: softens this box's slow first-compile path.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
