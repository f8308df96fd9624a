"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes.
"""

import os

# hard override: the environment pins JAX_PLATFORMS=axon (TPU) globally.
# The env var alone is unreliable here (the axon plugin can still win), so
# we also force it through jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

from snvc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import pytest


def pytest_sessionstart(session):
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running functional test")
