"""Test harness configuration.

Tests run on CPU with 8 fake XLA devices so the multi-device sharding paths
(data-parallel, sequence-parallel) are exercised without TPU hardware — the
TPU-idiomatic fake backend (SURVEY.md §4). Must run before jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Bit-parity tests against the torch/CPU oracle need true-f32 matmuls
# (the reference runs f32; torch's 'high' tf32 setting only affects GPUs).
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
