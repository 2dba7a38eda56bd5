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


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    The full suite accumulates hundreds of resident XLA:CPU executables;
    past ~300 tests that state has produced hard crashes (SIGSEGV/
    SIGABRT) inside later large compiles (observed on the m=2048 tiled-K2
    program, which passes in isolation under identical flags). Bounding
    the live-executable set keeps the process well clear of that regime.
    """
    yield
    import jax

    jax.clear_caches()
