"""Test configuration.

Platform policy: tests run on the REAL TPU (axon) by default — its compile
cache works and execution is fast.  The XLA:CPU persistent AOT cache is
broken on this host (machine-feature mismatch -> LLVM OOM -> segfault on
load), so when CPU is forced (HALO2_TESTS_ON_CPU=1, used for the virtual
8-device mesh flows) the persistent cache stays DISABLED and everything
recompiles.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import faulthandler
faulthandler.register(__import__("signal").SIGUSR1, file=sys.__stderr__)
faulthandler.dump_traceback_later(900, repeat=True, file=sys.__stderr__)

import jax  # noqa: E402  (import after env setup)

ON_CPU = bool(os.environ.get("HALO2_TESTS_ON_CPU"))
if ON_CPU:
    # NOTE: the axon plugin overrides the JAX_PLATFORMS env var; only the
    # config knob reliably forces CPU.
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)  # kernels must not rely on x64
if not ON_CPU:
    # persistent compile cache (TPU-helper entries only; see docstring)
    jax.config.update("jax_compilation_cache_dir", "/tmp/h2t_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
