"""Test configuration: force an 8-device CPU mesh (SURVEY.md §4).

Must run before jax is imported anywhere: force the host platform and split
it into 8 virtual devices so the multi-device sharding paths are exercised
without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# The environment may ship a TPU plugin whose sitecustomize overrides
# jax_platforms at interpreter start; force it back to CPU before any
# backend is initialized.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
