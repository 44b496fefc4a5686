"""Test harness: force an 8-device virtual CPU backend before jax imports.

This is the standard JAX substitute for a TPU slice in CI (SURVEY.md §4):
sharding/collective tests exercise a real 8-way mesh without hardware.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon sitecustomize forces jax_platforms="axon,cpu"; override before
# any backend initialisation so tests run on the virtual 8-CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
