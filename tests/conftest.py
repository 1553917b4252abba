"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Note: in this environment the JAX_PLATFORMS env var is overridden by the
TPU plugin, so the platform must be forced via jax.config before any
backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
