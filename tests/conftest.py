"""Test harness: force an 8-virtual-device CPU JAX platform.

The reference has no tests (SURVEY.md §4); this suite is net-new.  Multi-chip
sharding tests run on `--xla_force_host_platform_device_count=8` per standard
JAX practice, so the full pjit/mesh path is exercised without TPU hardware.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NOTE: the JAX_PLATFORMS env var is NOT sufficient in this environment (the
# axon TPU plugin registers itself regardless); the config update is.
jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_path():
    """Path to the read-only reference checkout (parity oracle), if present."""
    if not REFERENCE.exists():
        pytest.skip("reference repo not available")
    return REFERENCE


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
