"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip TPU hardware is not available in CI; all sharding tests run on a
virtual 8-device CPU mesh (same XLA collectives, same SPMD partitioner).
Must set flags before JAX initializes.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_enable_x64", False)  # kernels must not rely on x64
