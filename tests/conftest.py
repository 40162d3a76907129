"""Test configuration: CPU backend with 8 virtual devices, float64 numerics.

Mirrors the reference's float64 test regime (gpflow.default_float) and gives
every test access to a virtual 8-device mesh for sharding tests
(the driver separately dry-runs the multi-chip path).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers the axon TPU platform and
# overrides JAX_PLATFORMS; config.update wins as long as no backend has been
# initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# The suite is compile-dominated (every grad-parity test builds large
# graphs); the persistent compilation cache makes reruns fast.  The dir is
# host-fingerprinted: XLA:CPU entries embed host-specific AOT machine code
# and this VM migrates between physical hosts (see config.py).
from markovflow_tpu.config import setup_compilation_cache  # noqa: E402

setup_compilation_cache(
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(71892305)


@pytest.fixture(params=[(), (3,), (2, 1)], ids=["scalar", "b3", "b2x1"])
def batch_shape(request):
    """Batch shapes exercised globally, as in the reference
    (reference: tests/conftest.py:39-48)."""
    return request.param
