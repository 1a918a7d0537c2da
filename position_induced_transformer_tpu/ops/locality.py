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

import jax
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


def topk_threshold(dist: jnp.ndarray, locality: float) -> jnp.ndarray:
    """Tie-free fast equivalent of :func:`quantile_threshold`.

    The linear-interpolation quantile falls in ``[d_(c), d_(c+1))`` with
    ``c = topk_keep_count(L, locality)`` (1-indexed sorted row), so the mask
    ``d <= thr`` is identical whether ``thr`` is the interpolated quantile or
    simply the c-th smallest distance — whenever the quantile does not land
    inside a tie group (see test_ops_core.py on fp-fragility of regular
    grids). Cost is one ``lax.top_k`` of c ≪ L entries per row instead of a
    full-row sort, which is what makes per-sample-mesh geometry cheap enough
    to rebuild inside every training step (reference recomputes a full
    ``torch.quantile`` per forward: pit.py:49, train_elasticity.py:41-54).
    """
    c = topk_keep_count(dist.shape[-1], locality)
    if c >= dist.shape[-1]:
        return jnp.max(dist, axis=-1, keepdims=True)
    if c <= 32:
        # c-pass masked-min extraction: lax.top_k lowers to a FULL bitonic
        # sort on TPU (measured 61.5 ms vs 28.8 ms for the NACA decoder's
        # (20, 11271, 728) rows, c=15 — scripts/tpu_naca_profile.py), so for
        # the small keep-counts the reference localities produce (c = 15-20)
        # sequential min passes win. Under exact duplicate distances this
        # yields the c-th smallest *distinct* value (>= the c-th order
        # statistic), keeping tied neighbors the quantile would interpolate
        # past — identical logits either way, but not bit-parity under ties
        # (the exact-torch path in ops/posatt.py is).
        thr = jnp.min(dist, axis=-1, keepdims=True)
        for _ in range(c - 1):
            thr = jnp.min(
                jnp.where(dist > thr, dist, jnp.inf), axis=-1, keepdims=True
            )
        return thr
    neg_smallest, _ = jax.lax.top_k(-dist, c)
    return -neg_smallest[..., -1:]


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
