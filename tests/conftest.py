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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
