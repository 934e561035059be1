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
# NO persistent compile cache for the suite: the cache writer segfaults
# DETERMINISTICALLY serializing one of the engine-step executables
# (jax 0.9.0, ``put_executable_and_time`` -> zstandard.backend_c in the
# faulthandler dump; reproduced at the same test across fresh cache
# dirs, r3).  Compile times are dominated by interpret-mode pallas
# anyway, so the cache bought little here.  The TPU bench keeps its own
# cache (different executables, never hit the crash).
jax.config.update("jax_enable_compilation_cache", False)
