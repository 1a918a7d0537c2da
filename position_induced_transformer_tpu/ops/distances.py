"""Pairwise squared-distance metrics between point clouds.

Capability parity with the reference's ``dist2att`` distance computations
(reference: pit.py:47 euclidean, pit.py:190-195 periodic-1d,
pit.py:247-253 periodic-2d), re-expressed as standalone jnp functions so the
(parameter-independent) distance matrix can be precomputed once per mesh pair
and hoisted out of the jitted train step — the torch reference recomputes it
on every forward call.

All functions return **squared** distances. Shapes:

- fixed meshes:   mesh_out (L_out, d), mesh_in (L_in, d)  -> (L_out, L_in)
- batched meshes: mesh_out (B, L_out, d), mesh_in (B, L_in, d) -> (B, L_out, L_in)
"""

from __future__ import annotations

import jax.numpy as jnp


def euclidean_sq(mesh_out: jnp.ndarray, mesh_in: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distance; supports fixed and batched meshes.

    (reference: pit.py:47, pit.py:134)
    """
    diff = mesh_out[..., :, None, :] - mesh_in[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def periodic1d_sq(mesh_out: jnp.ndarray, mesh_in: jnp.ndarray) -> jnp.ndarray:
    """Squared distance on a 1-D torus.

    The domain length is inferred exactly the way the reference does
    (reference: pit.py:190-195): grid spacing from the first two input points,
    period ``l = dx * L_in``. Only the first coordinate participates.
    Fixed meshes only (the reference has no batched periodic variant).
    """
    dx = jnp.abs(mesh_in[1, 0] - mesh_in[0, 0])
    period = dx * mesh_in.shape[0]
    diff = jnp.abs(mesh_out[:, None, :] - mesh_in[None, :, :])
    diff = jnp.minimum(diff, period - diff)
    return diff[..., 0] ** 2


def periodic2d_sq(mesh_out: jnp.ndarray, mesh_in: jnp.ndarray) -> jnp.ndarray:
    """Squared distance on a 2-D torus.

    Resolution is inferred as ``sqrt(L_in)`` and the period per axis from the
    coordinate extent of the first axis (reference: pit.py:247-253). The
    per-axis minimum of direct and wrapped differences is summed over axes.
    """
    res = int(round(mesh_in.shape[0] ** 0.5))
    dx = (jnp.max(mesh_in[:, 0]) - jnp.min(mesh_in[:, 0])) / (res - 1)
    period = dx * res
    diff = jnp.abs(mesh_out[:, None, :] - mesh_in[None, :, :])
    diff = jnp.minimum(diff, period - diff)
    return jnp.sum(diff * diff, axis=-1)


_METRICS = {
    "euclidean": euclidean_sq,
    "periodic1d": periodic1d_sq,
    "periodic2d": periodic2d_sq,
}


def pairwise_sq_dist(mesh_out, mesh_in, metric: str = "euclidean"):
    """Dispatch by metric name ('euclidean' | 'periodic1d' | 'periodic2d')."""
    try:
        fn = _METRICS[metric]
    except KeyError:
        raise ValueError(
            f"unknown metric {metric!r}; expected one of {sorted(_METRICS)}"
        ) from None
    return fn(mesh_out, mesh_in)
