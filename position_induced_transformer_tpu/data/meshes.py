"""Mesh builders for regular grids (the reference builds these inline in
each driver, e.g. train_burgers.py:59-60, train_darcy.py:83-96,
train_vorticity.py:77-91)."""

from __future__ import annotations

import numpy as np


def grid_1d(n: int, lo: float = 0.0, hi: float = 1.0, endpoint: bool = False):
    """(n, 1) uniform 1-D mesh. ``endpoint=False`` drops the final point
    (periodic convention, reference: train_burgers.py:59)."""
    pts = np.linspace(lo, hi, n if endpoint else n + 1)
    if not endpoint:
        pts = pts[:-1]
    return pts.reshape(-1, 1).astype(np.float32)


def grid_2d(s: int, endpoint: bool = True):
    """(s, s, 2) uniform 2-D mesh on [0,1]^2, 'xy' meshgrid stacking order
    matching the reference (train_darcy.py:83-88). ``endpoint=False`` for
    periodic domains (train_vorticity.py:78-82)."""
    if endpoint:
        xs = np.linspace(0, 1, s)
    else:
        xs = np.linspace(0, 1, s + 1)[:-1]
    xx, yy = np.meshgrid(xs, xs)
    mesh = np.stack([xx.ravel(), yy.ravel()], axis=-1)
    return mesh.reshape(s, s, 2).astype(np.float32)


def grid_2d_rect(s0: int, s1: int, endpoint: bool = False):
    """(s0*s1, 2) structured-index grid on [0,1)^2 with dim-0 outer, matching
    row-major flattening of (s0, s1, C) fields (used by the TF-family NACA
    experiment's index-space distances, reference:
    tensorflow/6_NACA/utils.py:25-43)."""
    def axis(n):
        pts = np.linspace(0, 1, n if endpoint else n + 1)
        return pts if endpoint else pts[:-1]

    a, b = axis(s0), axis(s1)
    aa, bb = np.meshgrid(a, b, indexing="ij")
    return np.stack([aa.ravel(), bb.ravel()], axis=-1).astype(np.float32)


def angular_sort_perm(coords):
    """Per-sample permutation ordering a 2-D point cloud by angle around
    its centroid: (n, L, 2) -> (n, L) int permutation indices.

    For clouds sampled along a CLOSED curve (the elasticity unit-cell
    boundary, reference: train_elasticity.py:7-16) this makes index order
    follow spatial order, so the locality keep-mask of each row tile
    becomes a narrow circular band of columns — the precondition for the
    fused kernel's masked-tile skip (ops/locality.batched_band_starts
    circular=True). Position attention is permutation-equivariant in the
    keys and the per-point loss permutation-invariant, so sorting inputs,
    coordinates and targets with the SAME permutation changes nothing but
    the row order of model outputs.
    """
    import numpy as np

    c = np.asarray(coords)
    d = c - c.mean(axis=1, keepdims=True)
    return np.argsort(np.arctan2(d[..., 1], d[..., 0]), axis=1)
