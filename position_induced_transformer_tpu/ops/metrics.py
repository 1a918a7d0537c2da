"""Relative-error losses and metrics.

Parity surface (reference: utils.py:59-98 ``RelLpNorm``/``RelMaxNorm``;
tensorflow/1_InviscidBurgers/utils.py:12-32 ``rel_norm``/``rel_l1_median``;
tensorflow/4_Vorticity/utils.py stepwise/trajectory variants).

Conventions follow the reference exactly: per-sample, per-output-variable
relative norms over the mesh axis, averaged over variables. The torch-side
losses *sum* over the batch (the caller divides by the dataset size); the
TF-side ``rel_norm`` means over the batch. Both are provided.
"""

from __future__ import annotations

import jax.numpy as jnp


def _reshape(true: jnp.ndarray, pred: jnp.ndarray, out_dim: int):
    t = true.reshape(true.shape[0], -1, out_dim)
    p = pred.reshape(pred.shape[0], -1, out_dim)
    return t, p


def rel_lp_norm(
    true: jnp.ndarray,
    pred: jnp.ndarray,
    out_dim: int,
    p: float = 2,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Relative Lp error, mean over variables, **sum over batch**.

    (reference: utils.py:80-98). ``true``/``pred`` are reshaped to
    (B, L, out_dim); norms are taken along L. ``weights``: optional (B,)
    per-sample weights for the batch sum (0 drops a sample — used to mask
    the padded tail batch so evaluation covers every test sample for any
    batch size, unlike a drop-remainder loader).
    """
    t, q = _reshape(true, pred, out_dim)
    if p == 1:
        true_norm = jnp.sum(jnp.abs(t), axis=1)
        diff_norm = jnp.sum(jnp.abs(t - q), axis=1)
    elif p == 2:
        true_norm = jnp.sqrt(jnp.sum(t * t, axis=1))
        diff = t - q
        diff_norm = jnp.sqrt(jnp.sum(diff * diff, axis=1))
    else:
        true_norm = jnp.sum(jnp.abs(t) ** p, axis=1) ** (1.0 / p)
        diff_norm = jnp.sum(jnp.abs(t - q) ** p, axis=1) ** (1.0 / p)
    rel = jnp.mean(diff_norm / true_norm, axis=-1)  # (B,)
    if weights is not None:
        rel = rel * weights
    return jnp.sum(rel)


def rel_max_norm(
    true: jnp.ndarray,
    pred: jnp.ndarray,
    out_dim: int,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Relative L-infinity error, mean over variables, sum over batch.

    (reference: utils.py:59-77). ``weights`` as in :func:`rel_lp_norm`.
    """
    t, q = _reshape(true, pred, out_dim)
    true_norm = jnp.max(jnp.abs(t), axis=1)
    diff_norm = jnp.max(jnp.abs(t - q), axis=1)
    rel = jnp.mean(diff_norm / true_norm, axis=-1)
    if weights is not None:
        rel = rel * weights
    return jnp.sum(rel)


def rel_norm_mean(
    true: jnp.ndarray, pred: jnp.ndarray, p: float = 1
) -> jnp.ndarray:
    """TF-side loss: relative Lp over *flattened* per-sample tensors, mean
    over batch (reference: tensorflow/1_InviscidBurgers/utils.py:12-25).
    """
    t = true.reshape(true.shape[0], -1)
    q = pred.reshape(pred.shape[0], -1)
    if p == 1:
        rel = jnp.sum(jnp.abs(t - q), axis=1) / jnp.sum(jnp.abs(t), axis=1)
    else:
        rel = jnp.linalg.norm(t - q, ord=p, axis=1) / jnp.linalg.norm(
            t, ord=p, axis=1
        )
    return jnp.mean(rel)


def rel_l1_quartiles(true: jnp.ndarray, pred: jnp.ndarray):
    """(25%, 50%, 75%) quantiles of the per-sample relative L1 error of the
    first output variable (reference: tensorflow/1_InviscidBurgers/utils.py:27-32).
    """
    t, q = true[..., 0], pred[..., 0]
    rel = jnp.sum(jnp.abs(t - q), axis=1) / jnp.sum(jnp.abs(t), axis=1)
    return tuple(jnp.quantile(rel, jnp.array([0.25, 0.5, 0.75]), method="linear"))


def rel_norm_step(true: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Per-rollout-step mean relative L2 error for trajectories shaped
    (B, ..., steps) (reference: tensorflow/4_Vorticity/utils.py rel_norm_step).
    Returns a (steps,) vector.
    """
    b, s = true.shape[0], true.shape[-1]
    t = true.reshape(b, -1, s)
    q = pred.reshape(b, -1, s)
    rel = jnp.linalg.norm(t - q, axis=1) / jnp.linalg.norm(t, axis=1)  # (B, s)
    return jnp.mean(rel, axis=0)


def rel_norm_traj(true: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Whole-trajectory mean relative L2 error for (B, ..., steps) tensors
    (reference: tensorflow/4_Vorticity/utils.py rel_norm_traj)."""
    t = true.reshape(true.shape[0], -1)
    q = pred.reshape(pred.shape[0], -1)
    rel = jnp.linalg.norm(t - q, axis=1) / jnp.linalg.norm(t, axis=1)
    return jnp.mean(rel)
