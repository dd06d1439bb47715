"""Test configuration: run everything on CPU with 8 virtual devices.

The reference has no distributed-test prior art (SURVEY.md par4); multi-chip code
is validated here on a virtual CPU mesh via
``--xla_force_host_platform_device_count=8``.

Note: this machine's axon site hook overrides ``JAX_PLATFORMS`` from the
environment, so we must force the CPU backend through ``jax.config`` before the
backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_stark_test_jit_cache")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
# cache even small/fast-compiling programs (the suite re-runs many)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
