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
        # sort on TPU (measured 54.7 ms vs 22.4 ms for the NACA decoder's
        # (20, 11271, 728) rows, c=15, fresh-input scan harness —
        # scripts/tpu_naca_profile.py 2026-08-16), so for
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


def robust_topk_threshold(
    dist: jnp.ndarray,
    locality: float,
    window: int = 4,
    rel_gap: float = 1e-5,
) -> jnp.ndarray:
    """Codegen-invariant locality threshold: nearest WIDE-gap midpoint.

    ``topk_threshold`` + ``midpoint_to_next`` is still fragile on tie-heavy
    grids (53% of NACA C-grid decoder rows have their kc-th and (kc+1)-th
    smallest distances exactly tied — BASELINE.md band-skip paragraph): a
    real-arithmetic tie can SPLIT under a different compiler contraction
    (one value comes out 1 ulp above the other), which shifts the
    distinct-value sequence the masked-min passes walk, moves the cut
    inside the tie group, and flips kept columns between kernel shapes
    (scripts/debug_band_parity.py finding 2).

    This variant works on ORDER STATISTICS (multiplicity preserved, stable
    to ulp noise) and chooses the cut index ``i`` nearest the nominal keep
    count ``c`` — scanning c, c+1, c-1, c+2, ... — whose gap
    ``d_(i+1) - d_(i)`` is WIDE (``>= rel_gap * d_(i+1)``; both distance
    computations here are diff-square-sum, so cross-codegen noise is a few
    ulps RELATIVE to d, ~100x below this margin). The threshold is the
    midpoint of that gap, so the kept set ``d <= thr`` is invariant to any
    sub-margin recomputation difference (in-VMEM kernel distances at any
    tile width, XLA on another backend, live-vs-setup). Exactly-tied order
    statistics have zero gap and are never selected: the cut lands at a
    tie-group boundary, keeping or dropping each tie group WHOLE.

    On tie-safe rows (every nearby gap wide) the scan stops at ``c``
    immediately and this equals ``midpoint_to_next(topk_threshold(...))``
    — the quantile-equivalent kept set. On tie-heavy rows the kept count
    may deviate from ``c`` by up to ``window`` (a principled, bounded
    deviation from the reference's interpolation semantics; the
    exact-torch path in ops/posatt.py remains for bit-parity tests). If no
    wide gap exists within the window, falls back to the plain midpoint at
    ``c`` (best effort, the pre-round-5 behavior).
    """
    L = dist.shape[-1]
    c = topk_keep_count(L, locality)
    if c >= L:
        return jnp.max(dist, axis=-1, keepdims=True)
    lo = max(c - window, 1)
    hi = min(c + window, L - 1)
    neg, _ = jax.lax.top_k(-dist, hi + 1)
    small = -neg  # ascending order statistics d_(1..hi+1)
    d_i = small[..., lo - 1 : hi]  # d_(i),   i = lo..hi (1-indexed)
    d_n = small[..., lo : hi + 1]  # d_(i+1)
    wide = (d_n - d_i) >= rel_gap * d_n
    mid = 0.5 * (d_i + d_n)
    # preference scan c, c+1, c-1, ...: apply lowest-priority candidates
    # first so later (higher-priority) wide gaps overwrite them
    order = [c]
    for s in range(1, window + 1):
        if c + s <= hi:
            order.append(c + s)
        if c - s >= lo:
            order.append(c - s)
    thr = mid[..., c - lo : c - lo + 1]  # fallback: plain midpoint at c
    for i in reversed(order):
        j = i - lo
        thr = jnp.where(wide[..., j : j + 1], mid[..., j : j + 1], thr)
    return thr


def midpoint_to_next(dist: jnp.ndarray, thr: jnp.ndarray) -> jnp.ndarray:
    """Move a per-row threshold to the midpoint between it and the next
    strictly-greater distance: the keep set {d <= thr} is unchanged, but
    the threshold sits ~half a gap away from every distance, making the
    mask robust to ulp-level differences between the distance computation
    that produced ``thr`` and a kernel's in-VMEM recomputation (same op
    order, different compiler/FMA contraction). Rows where nothing is
    strictly greater (all remaining tied) keep the plain threshold."""
    nxt = jnp.min(
        jnp.where(dist > thr, dist, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(jnp.isfinite(nxt), thr + 0.5 * (nxt - thr), thr)


def batched_topk_thresholds(
    mesh_q: jnp.ndarray,
    mesh_k: jnp.ndarray,
    locality: float,
    metric: str = "euclidean",
    chunk: int = 32,
) -> "jnp.ndarray | None":
    """Per-sample per-row locality thresholds (B, L_q, 1), chunked over B.

    Per-sample meshes (elasticity/NACA) are CONSTANT across training, so
    their c-th-smallest thresholds are data, not computation: compute them
    once at setup and gather them with the batch instead of re-running the
    c-1 masked-min passes inside every train step (forward AND backward).
    The keep mask ``dist <= thr`` is identical either way. Chunking bounds
    the transient (chunk, L_q, L_k) distance tensor.
    """
    if locality >= 1.0:
        return None
    from position_induced_transformer_tpu.ops.distances import (
        pairwise_sq_dist,
    )

    def one_chunk(mq, mk):
        dist = pairwise_sq_dist(mq, mk, metric)
        return robust_topk_threshold(dist, locality)

    fn = jax.jit(one_chunk)
    B = mesh_q.shape[0]
    outs = [fn(mesh_q[s : s + chunk], mesh_k[s : s + chunk]) for s in range(0, B, chunk)]
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def batched_band_starts(
    mesh_q: jnp.ndarray,
    mesh_k: jnp.ndarray,
    thr: jnp.ndarray,
    tile_rows: int,
    metric: str = "euclidean",
    chunk: int = 16,
    min_saving: float = 0.75,
    width: "int | None" = None,
    circular: bool = False,
):
    """Kept-column band starts for the fused batched kernel's masked-tile
    skip: ``(starts (B, n_tiles) int32, band_width int)`` or ``None``.

    At locality 0.02 the keep mask ``dist <= thr`` blanks ~98% of each
    attention row, and when the key ordering is spatially coherent (the
    NACA C-grid latent, a strided slice of the output grid — reference:
    train_naca.py:62-65) the kept columns of a ``tile_rows``-row output
    tile form a narrow contiguous index band. Per-sample meshes are
    constant across training, so the band is data: computed once at setup
    (chunked over B like :func:`batched_topk_thresholds`), it lets the
    kernel run distances/softmax/contraction on a ``(tile_rows,
    band_width)`` slice instead of the full padded row — compute and
    transcendentals drop by ``band_width / L_in_padded``.

    Contract: for every (sample, tile), ALL kept columns lie inside
    ``[start, start + band_width)``; starts are 8-aligned (TPU sublane)
    and clamped so the band stays inside the 128-padded key axis. Returns
    ``None`` when the common band would cover more than ``min_saving`` of
    the padded width (spatially incoherent orderings, e.g. the elasticity
    point clouds) — callers then fall back to full-width tiles.

    ``width``: optional floor on the band width — pass the width another
    split (train vs test) produced so both share ONE static width (the
    kernel is specialized on it; the wider of the two covers both).

    ``circular``: treat the key axis as a ring (clouds ordered along a
    closed curve, e.g. the elasticity annulus sorted by angle): the band
    is the minimal circular arc covering the kept columns, and starts may
    point into the wrap margin ``[L_k, L_k + width)`` — the kernel caller
    appends a duplicated key margin (kernels.BandSpec.wrap) so a linear
    window still covers the seam-crossing tiles. Returns
    ``(starts, width, wrap)`` with ``wrap = width``.
    """
    import numpy as np

    from position_induced_transformer_tpu.ops.distances import (
        pairwise_sq_dist,
    )

    B, L_q = mesh_q.shape[0], mesh_q.shape[1]
    L_k = mesh_k.shape[1]
    n_tiles = -(-L_q // tile_rows)
    Lk_pad = -(-L_k // 128) * 128

    def one_chunk(mq, mk, th):
        dist = pairwise_sq_dist(mq, mk, metric)  # (c, L_q, L_k)
        keep = dist <= th
        # per (sample, tile) union over rows, padded to n_tiles * tile_rows
        pad = n_tiles * tile_rows - L_q
        keep = jnp.pad(keep, ((0, 0), (0, pad), (0, 0)))
        return keep.reshape(keep.shape[0], n_tiles, tile_rows, L_k).any(2)

    fn = jax.jit(one_chunk)
    keeps = [
        np.asarray(
            fn(mesh_q[s : s + chunk], mesh_k[s : s + chunk],
               thr[s : s + chunk])
        )
        for s in range(0, B, chunk)
    ]
    keep = np.concatenate(keeps, axis=0)  # (B, n_tiles, L_k) bool
    cols = np.arange(L_k)
    if circular:
        # minimal circular arc covering the kept columns = complement of
        # the largest circular RUN of unkept columns. Find it by scanning
        # the doubled mask for the longest zero run of length < L_k.
        lo = np.zeros(keep.shape[:2], np.int64)
        hi = np.zeros(keep.shape[:2], np.int64)
        for b in range(keep.shape[0]):
            for t in range(keep.shape[1]):
                k = keep[b, t]
                idx = np.flatnonzero(k)
                if idx.size == 0:
                    continue
                # circular gaps between consecutive kept columns
                gaps = np.diff(idx) - 1
                wrap_gap = (idx[0] + L_k - idx[-1]) - 1
                g = int(np.argmax(gaps)) if gaps.size else -1
                if gaps.size and gaps[g] > wrap_gap:
                    # arc starts after the largest interior gap and wraps
                    lo[b, t] = idx[g + 1]
                    hi[b, t] = idx[g] + 1 + L_k  # linear index in extension
                else:
                    lo[b, t] = idx[0]
                    hi[b, t] = idx[-1] + 1
    else:
        big = np.where(keep, cols, L_k)
        lo = big.min(-1)
        hi = np.where(keep, cols + 1, 0).max(-1)
        empty = hi <= lo  # all-masked tiles: harmless zero-width band at 0
        lo = np.where(empty, 0, lo)
        hi = np.where(empty, 0, hi)
    start = (lo // 8) * 8  # sublane-aligned
    need = int(np.max(hi - start)) if (hi > start).any() else 0
    need = -(-max(need, 8) // 128) * 128  # lane-aligned tile width
    width = max(need, width or 0)
    if width >= min_saving * Lk_pad or width >= L_k:
        # no meaningful skip — or (circular) a window wide enough to see
        # BOTH copies of a duplicated key, which would double-count it
        return None
    if circular:
        # extended key axis [0, L_k + width): starts stay in-bounds there
        ext_pad = -(-(L_k + width) // 128) * 128
        start = np.minimum(start, ext_pad - width)
        return jnp.asarray(start.astype(np.int32)), width, width
    start = np.minimum(start, Lk_pad - width)  # keep band in-bounds
    return jnp.asarray(start.astype(np.int32)), width


def batched_halfdist_percentile_thresholds(
    coords: jnp.ndarray, percentile: float, chunk: int = 8
) -> "jnp.ndarray | None":
    """(B, L, 1) exact linear-interpolation percentile thresholds over the
    TF point-cloud ``dist^2 / 2`` matrices (same op order as
    models/pit_tf.PiTTFPointCloud, reference:
    tensorflow/5_Elasticity/utils.py:92-95,172-177). Per-sample clouds are
    constant across training, so this runs once at setup; the threshold is
    the :func:`robust_topk_threshold` wide-gap midpoint (equals the
    interpolated percentile's kept set on tie-safe rows; codegen-invariant
    on tied ones), so the ``d <= thr`` mask is robust to compiler-level
    rounding differences.
    """
    if percentile > 100:
        return None

    def one_chunk(c):
        diff = c[:, :, None, :] - c[:, None, :, :]
        m = 0.5 * jnp.sum(diff * diff, axis=-1)
        return robust_topk_threshold(m, percentile / 100.0)

    fn = jax.jit(one_chunk)
    B = coords.shape[0]
    outs = [fn(coords[s : s + chunk]) for s in range(0, B, chunk)]
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


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
