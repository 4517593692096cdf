"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip TPU hardware is not available in CI; all sharding tests run on a
virtual 8-device CPU mesh (same XLA collectives, same SPMD partitioner).
Must set flags before JAX initializes.
"""
import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the remote TPU
# tunnel ("axon"), which makes op-by-op test traffic orders of magnitude
# slower. Set HALO2_TESTS_ON_TPU=1 to run the suite against real hardware.
if not os.environ.get("HALO2_TESTS_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_enable_x64", False)  # kernels must not rely on x64
# Persistent compile cache: field/NTT/MSM graphs are large; recompiling them
# on every pytest run dominates wall time otherwise.
jax.config.update("jax_compilation_cache_dir", "/tmp/halo2_zkcert_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
