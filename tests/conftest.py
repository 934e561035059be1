"""Test configuration: force a CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh
(``xla_force_host_platform_device_count``); kernels and engine math are
backend-independent (int64/uint32 exact arithmetic).
"""

import os

# The session environment may pin JAX_PLATFORMS to the TPU tunnel; tests
# must run on the local CPU backend (exact int64 math is backend-independent).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU-tunnel backend with
# ``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start,
# which overrides the environment variable — pin the config key itself or
# every eager test op pays a ~26 ms tunnel round-trip.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: engine cores compile once across pytest runs.
# Separate directory from the TPU bench cache — concurrent writers to one
# cache dir have produced a segfault in the zstandard cache-write path.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tiberate_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
