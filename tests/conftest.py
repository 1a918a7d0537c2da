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

# The environment's site hook force-registers a TPU-tunnel backend via
# jax.config (overriding JAX_PLATFORMS); override it back — tests run on
# CPU with the fake 8-device mesh.
jax.config.update("jax_platforms", "cpu")

# Bit-parity tests against the torch/CPU oracle need true-f32 matmuls
# (the reference runs f32; torch's 'high' tf32 setting only affects GPUs).
jax.config.update("jax_default_matmul_precision", "highest")

# XLA compiles are slow in this environment; cache them across test runs.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
