"""Position attention: the core primitive of the PiT framework.

Attention weights are computed purely from pairwise squared distances between
mesh points — no query/key projections — with a learnable per-head bandwidth
and a quantile locality mask, followed by a row softmax and a value
contraction (reference: pit.py:28-71 ``posatt``/``posatt_cross``,
pit.py:129-159 fixed-mesh variants).

This module is the **pure-jnp reference implementation** (CPU-testable oracle
and XLA fallback). The fused Pallas TPU kernel in
``position_induced_transformer_tpu.kernels`` implements the same contract and
is validated against this.

Functional contract
-------------------
``position_attention(dist, lmda, inputs, locality)`` where

- ``dist``:   (L_out, L_in) fixed-mesh or (B, L_out, L_in) batched-mesh
              squared distances,
- ``lmda``:   (H, 1, 1) learnable bandwidth parameters,
- ``inputs``: (B, L_in, D) values,
- returns     (B, L_out, H*D) — per-head convolutions concatenated along the
              feature axis (reference: pit.py:54-57 ``convolution``).

The self-attention module of the reference additionally concatenates its
input to the output (residual-by-concat, reference: pit.py:44); that
composition lives in the model layer, not here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from position_induced_transformer_tpu.ops.locality import keep_mask

_F32_MAX = float(jnp.finfo(jnp.float32).max)


def bandwidth_scale(lmda: jnp.ndarray) -> jnp.ndarray:
    """Per-head non-negative bandwidth ``tan(pi/4*(1-1e-7)*(1+sin(lmda)))``.

    (reference: pit.py:48). Range [0, ~1.3e7); smooth and unbounded-ish,
    which is why the reference found it trains better than ``tan(r)``.
    """
    return jnp.tan(0.25 * jnp.pi * (1.0 - 1e-7) * (1.0 + jnp.sin(lmda)))


def attention_weights(
    dist: jnp.ndarray,
    lmda: jnp.ndarray,
    locality: float,
    keep: jnp.ndarray | None = None,
    *,
    thr: jnp.ndarray | None = None,
    exact_torch_quantile: bool = False,
) -> jnp.ndarray:
    """Distance matrix -> masked softmax attention weights.

    Returns (H, L_out, L_in) for a fixed mesh (dist.ndim == 2) or
    (B, H, L_out, L_in) for batched meshes (dist.ndim == 3).

    ``keep`` optionally supplies a precomputed locality mask (same leading
    shape as ``dist``); ``thr`` a precomputed per-row quantile threshold
    (..., L_out, 1) from which the mask is derived elementwise — see
    ops/locality.py for why both are bandwidth-independent and can be
    hoisted out of the train step. ``exact_torch_quantile`` forces the
    reference's per-head quantile over the *scaled* distances (slow path,
    used for parity testing).
    """
    scale = bandwidth_scale(lmda)  # (H, 1, 1)
    if dist.ndim == 2:  # fixed mesh: (L_out, L_in) -> (H, L_out, L_in)
        scaled = dist[None, :, :] * scale
        expand = lambda m: m[None, :, :]
    else:  # batched: (B, L_out, L_in) -> (B, H, L_out, L_in)
        scaled = dist[:, None, :, :] * scale
        expand = lambda m: m[:, None, :, :]

    if locality < 1.0:
        if exact_torch_quantile:
            thr = jnp.quantile(scaled, locality, axis=-1, keepdims=True)
            scaled = jnp.where(scaled <= thr, scaled, _F32_MAX)
        else:
            if keep is None:
                keep = (dist <= thr) if thr is not None else keep_mask(dist, locality)
            scaled = jnp.where(expand(keep), scaled, _F32_MAX)
    # locality >= 1.0 keeps every entry (quantile at 1.0 is the row max and
    # d <= max is always true — reference: pit.py:102 uses locality=1.0 for
    # the global processor blocks), so no masking work is needed.

    return jax.nn.softmax(-scaled, axis=-1)


def convolve(att: jnp.ndarray, inputs: jnp.ndarray) -> jnp.ndarray:
    """Value contraction + head concat (reference: pit.py:54-57,141-144).

    att: (H, L_out, L_in) or (B, H, L_out, L_in); inputs: (B, L_in, D)
    -> (B, L_out, H*D), feature layout [head0 | head1 | ...] interleaved as
    (H, D) per point, matching the reference's ``reshape(B, -1, H*D)`` of a
    (B, L_out, H, D) array.
    """
    if att.dtype != inputs.dtype:
        # mixed precision (models/pit.py compute_dtype): the softmax runs
        # in f32 for mask/sentinel exactness; casting the weights to the
        # activations' dtype (bf16) halves the (H, L_out, L_in) stream —
        # the largest tensor this op touches. Entries are in [0, 1], so
        # bf16's 2^-8 relative step costs ~0.4% per weight. f32
        # activations (the default, and every parity test) hit att.dtype
        # == inputs.dtype and skip this.
        att = att.astype(inputs.dtype)
    if att.ndim == 3:
        out = jnp.einsum("hnj,bjd->bnhd", att, inputs)
    else:
        out = jnp.einsum("bhnj,bjd->bnhd", att, inputs)
    b, n = out.shape[0], out.shape[1]
    return out.reshape(b, n, -1)


def position_attention(
    dist: jnp.ndarray,
    lmda: jnp.ndarray,
    inputs: jnp.ndarray,
    locality: float,
    keep: jnp.ndarray | None = None,
    *,
    thr: jnp.ndarray | None = None,
    exact_torch_quantile: bool = False,
) -> jnp.ndarray:
    """Full op: distances -> attention -> value contraction (XLA path)."""
    att = attention_weights(
        dist, lmda, locality, keep, thr=thr,
        exact_torch_quantile=exact_torch_quantile,
    )
    return convolve(att, inputs)
