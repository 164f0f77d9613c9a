"""Environment / platform detection helpers.

The framework runs identically on TPU and CPU; kernels pick the Pallas path on
TPU and a pure-XLA path elsewhere (tests emulate an 8-device mesh on CPU via
``--xla_force_host_platform_device_count``, see tests/conftest.py).
"""

from __future__ import annotations

import functools

import jax


@functools.cache
def default_backend() -> str:
    return jax.default_backend()


def tpu_available() -> bool:
    return default_backend() == "tpu"


def use_pallas() -> bool:
    """Whether to use the Pallas TPU kernels (vs the portable XLA path).

    ``VQT_PALLAS=0`` forces the XLA path even on TPU (A/B benchmarking;
    also the escape hatch if a Mosaic regression ever blocks serving).
    """
    import os
    if os.environ.get("VQT_PALLAS") == "0":
        return False
    return tpu_available()
