"""Test configuration: run on CPU with 8 virtual devices so sharding tests work
without TPU hardware (SURVEY.md §4e). Must run before jax is imported."""

import os

# Force CPU: the environment pins JAX_PLATFORMS=axon (the tunneled TPU), which
# tests must not depend on (and must not hog).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
