"""Test configuration: force an 8-virtual-device CPU platform.

Tests must not depend on TPU hardware; mesh/pjit/psum code paths are exercised
on 8 virtual CPU devices (the JAX-native analog of a multi-chip slice).
"""

import os

# Must be set before jax is imported anywhere in the test process. Force CPU
# even if the ambient environment selects a TPU platform (e.g. JAX_PLATFORMS=axon).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# Belt and braces: some environments import jax before conftest (plugins,
# sitecustomize), in which case the env var above is captured too late.
# config.update works any time before backend initialization.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
