"""Quantile-based locality masking for position attention.

The reference masks attention logits above a per-row quantile of the scaled
distance (reference: pit.py:49-50, linear-interpolation ``torch.quantile``).

TPU-first observation: the bandwidth scale
``s = tan(pi/4 * (1-eps) * (1 + sin(lambda)))`` is non-negative, and the
quantile operator commutes with multiplication by a non-negative scalar:
``quantile(s*d) == s * quantile(d)`` and hence
``(s*d <= quantile(s*d)) == (d <= quantile(d))`` whenever ``s > 0``. The
keep-mask is therefore *independent of the learnable bandwidth* and of the
head index, so it can be computed once per (mesh_out, mesh_in, locality)
triple — outside the jitted train step for fixed meshes — instead of per
head per forward pass as the reference does. (The only divergence is the
measure-zero point s == 0, i.e. sin(lambda) == -1 exactly, where the
reference degenerates to a uniform softmax over the full row while the
precomputed mask keeps the locality subset.)

An exact-reference slow path (quantile over the scaled distances, per head)
is kept for bit-parity testing: see ``position_attention(...,
exact_torch_quantile=True)`` in ops/posatt.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def quantile_threshold(dist: jnp.ndarray, locality: float) -> jnp.ndarray:
    """Per-row linear-interpolation quantile along the last axis, keepdims.

    Matches ``torch.quantile(dist, locality, dim=-1, keepdim=True)``
    (both default to the 'linear' interpolation method).
    """
    return jnp.quantile(dist, locality, axis=-1, keepdims=True, method="linear")


def keep_mask(dist: jnp.ndarray, locality: float) -> jnp.ndarray:
    """Boolean mask of entries at-or-below the per-row locality quantile.

    ``True`` entries participate in the softmax; ``False`` entries are
    excluded (the reference assigns them float32.max before negation,
    reference: pit.py:50).
    """
    return dist <= quantile_threshold(dist, locality)


def topk_keep_count(L_in: int, locality: float) -> int:
    """Number of entries a per-row quantile mask keeps, absent ties.

    With linear interpolation over L sorted values the threshold falls in
    ``[d_(k), d_(k+1))`` with ``k = floor(locality * (L-1))`` (0-indexed),
    keeping exactly ``k + 1`` entries. Useful for fixed-top-k fast paths in
    kernels where the quantile semantics reduce to a k-nearest-neighbours
    mask.
    """
    if locality >= 1.0:
        return L_in
    return int(locality * (L_in - 1)) + 1
