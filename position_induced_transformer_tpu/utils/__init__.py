"""Small framework utilities."""

from __future__ import annotations

import jax
import numpy as np


def count_params(params) -> int:
    """Total number of scalars in a parameter pytree.

    (capability parity with reference: utils.py:52-57 ``count_params``).
    """
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def tree_bytes(params) -> int:
    """Total bytes of a pytree of arrays."""
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params))
