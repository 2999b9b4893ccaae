"""Test environment: CPU backend, float64, 8 virtual devices for mesh tests.

Note: this environment pre-imports jax via a sitecustomize hook that registers
the TPU plugin, so setting JAX_PLATFORMS in os.environ here is too late.
Backend selection is lazy, so ``jax.config.update("jax_platforms", ...)``
still wins as long as no array op has run yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
