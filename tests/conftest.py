"""Test harness config.

Tests run on a virtual 8-device CPU mesh (the standard trick for exercising
TPU sharding/collectives without a pod — SURVEY.md §4). Environment must be
set before jax initializes, hence module import order matters: this conftest
is imported by pytest before any test module imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Persistent compiled-executable cache: re-runs of the suite skip most XLA
# compile time (the dominant cost of the e2e tests).
from vo_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu"
# programmatically, which beats the env var — override it back to cpu so the
# suite runs on the 8-device virtual CPU mesh, not through the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng():
    """Seeded generator, same seed family as the reference tests
    (default_rng(2023), e.g. test_helpers.py:12)."""
    return np.random.default_rng(2023)
