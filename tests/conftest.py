"""Test harness config: run on CPU with 8 virtual devices so sharding
tests exercise a real Mesh without TPU hardware (SURVEY.md §4
"distributed-without-cluster").

NOTE: this box's sitecustomize.py imports jax at interpreter startup with
JAX_PLATFORMS=axon (the TPU tunnel), so setting env vars here is too late
for import-time selection — we must use jax.config.update after import.
XLA_FLAGS still works because the CPU client is created lazily.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: softens this box's slow first-compile path.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
