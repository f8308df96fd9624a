"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes.
"""

import os

# hard override: the environment pins JAX_PLATFORMS=axon (TPU) globally
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
