"""Mesh geometry: precomputed distances + locality masks for a PiT model.

TPU-first design point: in the reference, pairwise distances and quantile
masks are recomputed from the mesh coordinates on **every forward call**
(reference: pit.py:46-52), even though for six of the seven benchmarks the
meshes never change. Here the geometry — the three distance matrices
(encoder cross, processor self, decoder cross) and the bandwidth-independent
locality keep-masks (see ops/locality.py) — is computed **once** per
(mesh_in, mesh_ltt, mesh_out) triple and carried as a pytree of constants
into the jitted step. For per-sample meshes (elasticity/NACA,
reference: train_elasticity.py:46, train_naca.py:62-65) the same builder runs
on traced batched arrays inside the step.

Masks are stored as float32 additive biases? No — as booleans; XLA selects
are free next to the softmax and booleans are 4x smaller than f32 in HBM.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from position_induced_transformer_tpu.ops.distances import pairwise_sq_dist
from position_induced_transformer_tpu.ops.locality import (
    quantile_threshold,
    topk_threshold,
)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Geometry:
    """Distances and locality thresholds binding a PiT model to a mesh triple.

    ``dist_*`` are squared distances: ``dist_down`` (L_ltt, L_in) for the
    encoder cross-attention, ``dist_proc`` (L_ltt, L_ltt) for the processor
    self-attention blocks, ``dist_up`` (L_out, L_ltt) for the decoder. For
    batched per-sample meshes each gains a leading batch axis.

    ``thr_*`` are precomputed per-row locality quantile thresholds
    (..., L_rows, 1): bandwidth-independent (ops/locality.py), 4*L bytes vs
    an L^2 boolean mask, and directly consumable by the fused Pallas kernel.
    None = compute inside the step (batched meshes) or unmasked.

    ``mesh_in`` is retained for the mesh-concat encoder input
    (reference: train_burgers.py:45).

    **Lazy per-sample geometry**: for batched meshes rebuilt inside every
    train step (elasticity/NACA), ``dist_*`` may be None with ``mesh_ltt``/
    ``mesh_out`` carrying the raw coordinates instead — the attention op
    then either runs the fused batched Pallas kernel (distances + locality
    threshold + softmax + matmul computed tile-resident in VMEM, never
    materializing the (B, L_out, L_in) tensors in HBM) or, on non-TPU
    backends, builds the distances on the fly in XLA.
    """

    mesh_in: Any
    dist_down: Any
    dist_proc: Any
    dist_up: Any
    thr_down: Optional[Any] = None
    thr_up: Optional[Any] = None
    mesh_ltt: Optional[Any] = None
    mesh_out: Optional[Any] = None
    # optional kept-column bands (kernels/posatt_batched.BandSpec) for the
    # lazy batched path's masked-tile skip — setup-computed, like thr_*
    band_down: Optional[Any] = None
    band_up: Optional[Any] = None

    def tree_flatten(self):
        children = (
            self.mesh_in,
            self.dist_down,
            self.dist_proc,
            self.dist_up,
            self.thr_down,
            self.thr_up,
            self.mesh_ltt,
            self.mesh_out,
            self.band_down,
            self.band_up,
        )
        return children, None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)


def build_geometry(
    mesh_in: jnp.ndarray,
    mesh_ltt: jnp.ndarray,
    mesh_out: jnp.ndarray,
    *,
    metric: str = "euclidean",
    en_loc: float = 0.02,
    de_loc: float = 0.02,
    precompute_masks: bool = True,
    threshold_impl: str = "quantile",
    lazy: bool = False,
) -> Geometry:
    """Build a :class:`Geometry` for fixed (L, d) or batched (B, L, d) meshes.

    ``precompute_masks=True`` materializes the per-row locality thresholds
    eagerly — the right choice for fixed meshes where this runs once outside
    jit. Pass False to defer the quantile into the attention op (per-sample
    meshes rebuilt inside the step each batch).

    ``threshold_impl``: 'quantile' (exact linear-interpolation quantile, a
    full-row sort) or 'topk' (c-th smallest distance — the same keep-mask
    absent ties at a fraction of the cost; see ops/locality.py). 'topk' is
    the right choice when the builder runs traced inside the train step on
    per-sample meshes (elasticity/NACA).

    ``lazy=True`` (batched Euclidean meshes only) skips building distances
    entirely and stores the coordinates — the attention op fuses distance,
    threshold, softmax and contraction on TPU (kernels/posatt_batched.py).
    """
    if lazy:
        if metric != "euclidean":
            raise ValueError("lazy geometry supports the euclidean metric only")
        return Geometry(
            mesh_in=mesh_in,
            dist_down=None, dist_proc=None, dist_up=None,
            mesh_ltt=mesh_ltt, mesh_out=mesh_out,
        )
    dist_down = pairwise_sq_dist(mesh_ltt, mesh_in, metric)
    dist_proc = pairwise_sq_dist(mesh_ltt, mesh_ltt, metric)
    dist_up = pairwise_sq_dist(mesh_out, mesh_ltt, metric)
    thr_down = thr_up = None
    if precompute_masks:
        thr_fn = {"quantile": quantile_threshold, "topk": topk_threshold}[
            threshold_impl
        ]
        if en_loc < 1.0:
            thr_down = thr_fn(dist_down, en_loc)
        if de_loc < 1.0:
            thr_up = thr_fn(dist_up, de_loc)
    return Geometry(
        mesh_in=mesh_in,
        dist_down=dist_down,
        dist_proc=dist_proc,
        dist_up=dist_up,
        thr_down=thr_down,
        thr_up=thr_up,
    )


def build_geometry_host(
    mesh_in,
    mesh_ltt,
    mesh_out,
    *,
    metric: str = "euclidean",
    en_loc: float = 0.02,
    de_loc: float = 0.02,
) -> Geometry:
    """Fixed-mesh geometry via the native multithreaded C++ builder
    (native/geometry.cpp): distances + nth_element quantile thresholds on
    the host, one HBM upload. Falls back to :func:`build_geometry` when the
    native library is unavailable. Host-only (concrete meshes, not traced).

    Calling into the .so from a TPU-tunnel-attached process permanently
    degrades that process's device dispatch ~10x (CLAUDE.md), so on non-CPU
    backends the ctypes calls are quarantined in a short-lived subprocess
    (data/native.py geometry_host_subprocess_many). ``PIT_NATIVE_GEOMETRY``:
    'never' = jnp path, 'force' = in-process native regardless of backend,
    default = in-process on CPU, subprocess elsewhere.
    """
    import os

    import numpy as np

    from position_induced_transformer_tpu.data import native

    use_native = os.environ.get("PIT_NATIVE_GEOMETRY", "auto")
    on_cpu = jax.default_backend() == "cpu"
    fallback = lambda: build_geometry(
        jnp.asarray(mesh_in), jnp.asarray(mesh_ltt), jnp.asarray(mesh_out),
        metric=metric, en_loc=en_loc, de_loc=de_loc,
    )
    if use_native == "never" or native.load() is None:
        return fallback()
    mi, ml, mo = (np.asarray(m, np.float32) for m in (mesh_in, mesh_ltt, mesh_out))
    requests = [
        (ml, mi, metric, en_loc),
        (ml, ml, metric, 1.0),
        (mo, ml, metric, de_loc),
    ]
    if use_native == "force" or on_cpu:
        parts = [native.geometry_host(*r) for r in requests]
    else:  # quarantine all three builds in ONE child process
        parts = native.geometry_host_subprocess_many(requests)
    if parts is None or any(p is None for p in parts):
        return fallback()
    (dist_down, thr_down), (dist_proc, _), (dist_up, thr_up) = parts
    as_dev = lambda a: None if a is None else jnp.asarray(a)
    return Geometry(
        mesh_in=jnp.asarray(mi),
        dist_down=as_dev(dist_down),
        dist_proc=as_dev(dist_proc),
        dist_up=as_dev(dist_up),
        thr_down=as_dev(thr_down),
        thr_up=as_dev(thr_up),
    )
