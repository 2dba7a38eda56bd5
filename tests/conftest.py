"""Test configuration: force CPU with a virtual 8-device mesh so sharding
tests run anywhere (including containers where a TPU platform plugin is
registered and pre-selected at interpreter start)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# An injected sitecustomize may have force-selected a TPU platform; override.
jax.config.update("jax_platforms", "cpu")
