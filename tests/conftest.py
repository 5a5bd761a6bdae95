"""Test configuration: force CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (the TPU-world fake backend the
reference lacks — SURVEY.md §4)."""

import os

# Must be set before jax import.  The session environment may pin
# JAX_PLATFORMS to a TPU tunnel; tests always run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin (if present in this image) force-selects itself via
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start;
# claim the config back so the suite runs on the 8-device virtual CPU mesh
# and never blocks on the single-process TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
