"""Test harness config: run everything on CPU with 8 virtual devices.

Multi-chip sharding paths are exercised on a virtual CPU mesh, per
SURVEY.md §4 ("multi-host logic tested with xla_force_host_platform_device_count").

Note: this container's sitecustomize registers the axon TPU plugin and calls
``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start, which
overrides the ``JAX_PLATFORMS`` env var -- so we must re-update the config
here (before any backend is initialized) to keep tests off the single shared
TPU chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs[0]}"
    return devs
