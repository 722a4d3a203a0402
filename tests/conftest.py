"""Test harness: run everything on CPU with 8 virtual devices so the
multi-chip sharding path is exercised without TPU hardware (SURVEY.md
section 4: CPU-simulated multi-chip tests)."""

import os

# Force CPU: the ambient environment may point JAX at a (slow, tunneled) TPU.
os.environ["JAX_PLATFORMS"] = os.environ.get("RESNET_TPU_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the tunneled TPU backend and sets
# jax_platforms='axon,cpu'; pin back to CPU after import (backends are lazy).
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
