"""Test configuration: force the JAX CPU backend with 8 virtual devices so
sharding/collective tests run without TPU hardware (SURVEY.md §4.4).

The driver environment's sitecustomize registers the `axon` TPU backend and
force-updates `jax_platforms` at interpreter start, so the JAX_PLATFORMS
env var alone is NOT enough — we must override the config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
