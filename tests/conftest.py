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

# The axon sitecustomize (/root/.axon_site, via PYTHONPATH) imports jax at
# interpreter startup, so jax snapshots JAX_PLATFORMS=axon BEFORE this file's
# env assignment runs — with only the assignment above, pytest silently runs
# on the real TPU. config.update still works (backends initialize lazily, on
# first jax.devices()), so force the platform through the config API too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
