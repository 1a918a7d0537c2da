"""Parameter initializers matching the reference's torch defaults.

- ``kaiming_normal``: torch ``nn.init.kaiming_normal_`` with its defaults
  (fan_in mode, leaky_relu gain sqrt(2)) — used for every MLP weight in the
  reference (reference: pit.py:18-19).
- ``torch_linear_bias``: torch ``nn.Linear``'s default bias init,
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — the reference never overrides it.
- ``uniform01``: U[0, 1) for the per-head bandwidth ``lmda``
  (reference: pit.py:35 ``torch.rand``).
- ``he_normal_tf``: truncated he-normal matching keras "he_normal", for the
  TF-semantics models (reference: tensorflow/1_InviscidBurgers/utils.py:72).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kaiming_normal(key, shape, dtype=jnp.float32):
    """Weight init N(0, 2/fan_in) for a (fan_in, fan_out) kernel."""
    fan_in = shape[0]
    std = math.sqrt(2.0 / fan_in)
    return std * jax.random.normal(key, shape, dtype)


def torch_linear_bias(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def uniform01(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype)


def he_normal_tf(key, shape, dtype=jnp.float32):
    """Keras he_normal: truncated normal (|z| < 2 std) with std sqrt(2/fan_in)."""
    return jax.nn.initializers.he_normal()(key, shape, dtype)
