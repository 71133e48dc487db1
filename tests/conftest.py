"""Test configuration.

Force JAX onto a virtual 8-device CPU mesh BEFORE any jax import so the
multi-chip sharding paths are exercised without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # harness presets axon; env alone is
# not enough (the axon plugin still wins), so also force via jax.config.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
