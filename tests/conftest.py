"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax is imported anywhere.
"""

import os

# The environment pins JAX_PLATFORMS=axon (one real TPU chip); tests always
# run on a virtual 8-device CPU mesh instead, so force-override.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # CPU parity tests use f64

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
