"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes its backends, hence the
env mutation at module import time (pytest imports conftest first).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the axon TPU default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at
# interpreter startup; point the config back at plain CPU for tests.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture()
def rng():
    return np.random.default_rng(20260816)


@pytest.fixture()
def key():
    return jax.random.PRNGKey(0)
