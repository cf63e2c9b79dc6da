"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is
validated on XLA's host-platform virtual devices (SURVEY §2d / §5.8).
Must run before jax initialises, hence the env mutation at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env may preset the TPU platform
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A sitecustomize hook may register a TPU PJRT plugin and force its
# platform regardless of JAX_PLATFORMS; jax.config wins over both.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def tmp_data_dir(tmp_path):
    return tmp_path
