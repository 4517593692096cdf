"""Test configuration.

Platform policy: tests run on the REAL TPU (axon) by default — its compile
cache works and execution is fast.  When CPU is forced
(HALO2_TESTS_ON_CPU=1, used for the virtual 8-device mesh flows) a
separate CPU compile cache is used — the AOT loader's machine-feature
warnings are benign on current jax (round-4 re-verification; the round-3
segfault did not reproduce).
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
# persistent compile cache, per-platform dirs.  The XLA:CPU AOT loader
# warns about a machine-feature mismatch but loads and runs correctly on
# current jax (re-verified round 4; the round-3 segfault did not
# reproduce).  Separate dir so a CPU-cache regression can be cleared
# without nuking the TPU cache.
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/h2t_jax_cache_cpu" if ON_CPU
                  else "/tmp/h2t_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
