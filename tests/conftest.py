"""Test env: force CPU with 8 virtual devices so mesh/sharding paths run
without TPU hardware (SURVEY.md §4 prescription). Must run before any test
module imports jax. The axon site hook re-forces JAX_PLATFORMS=axon, so we
also override via jax.config after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
