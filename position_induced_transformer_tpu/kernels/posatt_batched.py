"""Fused batched position-attention Pallas TPU kernel (per-sample meshes).

The elasticity/NACA benchmarks rebuild geometry from per-sample point
clouds inside every training step (reference: train_elasticity.py:41-54,
train_naca.py:62-65): squared distances (B, L_out, L_in), a per-row
locality quantile, masking, softmax, and the value contraction. Doing that
in XLA materializes the distance AND attention tensors in HBM each step
(the NACA decoder's are 656 MB each) and pays a full-row sort for the
quantile — measured 73% of the NACA step (scripts/tpu_naca_profile.py).

This kernel fuses the whole pipeline at the tile level, exploiting that
per-sample meshes are small (L_in <= a few thousand), so an ENTIRE row of
the attention matrix fits in VMEM:

- grid ``(B, L_out/TLo)``; each cell loads a (TLo, d) query-coordinate
  tile plus the full (L_in, d) key coordinates and (L_in, D) values;
- distances are computed in VMEM per coordinate (same operation order as
  ops/distances.euclidean_sq, so numerics match the XLA oracle);
- the locality threshold is the c-th smallest distance per row
  (c = topk_keep_count, ops/locality.py), found with c-1 masked-min passes
  over the resident tile — no sort, no HBM round trip;
- softmax is a plain full-row softmax (no online rescaling needed);
- per head: one (TLo, L_in) x (L_in, D) MXU matmul into the (TLo, H*D)
  output tile.

HBM traffic is meshes + values + output only — the (B, L_out, L_in)
intermediates never exist. The backward (custom VJP) recomputes attention
tiles the same way and streams dValues/dScale in one pass; no residuals
beyond the primal inputs are saved.

Contract matches ops.posatt.position_attention for batched dists: values
(B, L_in, D) shared across heads, output (B, L_out, H*D). Euclidean metric
only (the only metric the reference uses with per-sample meshes).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from position_induced_transformer_tpu.ops.locality import topk_keep_count
from position_induced_transformer_tpu.ops.posatt import bandwidth_scale

_NEG = -1e38

# Padding value for KEY coordinates (all coordinate kernels): squared
# distance from any real query to a padded key is ~1e30 per axis — above
# any real locality threshold, so padded columns are never kept by a
# ``dist <= thr`` compare AND can never win the bare row-min that
# _shifted_dist relies on. Finite so ``-dsh * s`` stays -inf/finite (an
# inf distance times s == 0 would make NaN); 1e15 squared is ~1e30,
# comfortably inside f32 while dominating any realistic coordinate
# magnitude (reference meshes are O(1..100); a user mesh would need
# coords > ~2.5e14 to break the invariant, far beyond f32 mesh
# precision).
_PAD_COORD = 1e15


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _dist_tile(mq, mk, space_dim: int):
    """(TLo, Li) squared Euclidean distances, computed per coordinate with
    the same op order as ops/distances.euclidean_sq (diff -> square -> sum)
    so results agree bitwise with the XLA path."""
    dist = None
    for k in range(space_dim):
        diff = mq[:, k : k + 1] - mk[:, k : k + 1].T  # (TLo, Li)
        sq = diff * diff
        dist = sq if dist is None else dist + sq
    return dist


def _keep_mask(dist, col_valid, keep_count: int, L_in: int):
    """Locality keep-mask from the c-th smallest distance per resident row
    (c-1 masked-min passes; see ops/locality.topk_threshold for the tie
    caveat). Padded columns are +inf and never kept."""
    d = jnp.where(col_valid, dist, jnp.inf)
    if keep_count >= L_in:
        return col_valid
    thr = jnp.min(d, axis=-1, keepdims=True)
    for _ in range(keep_count - 1):
        thr = jnp.min(jnp.where(d > thr, d, jnp.inf), axis=-1, keepdims=True)
    return d <= thr


def _shifted_dist(dist):
    """``dist - dmin`` with dmin the BARE per-row minimum of the resident
    tile — the exact, HEAD-INDEPENDENT softmax shift: one reduction and
    one subtract per TILE, amortized over all H heads (a conventional
    max-subtracted softmax pays both per HEAD, and a kept-masked min
    would pay an extra where() pass). The bare min equals the min over
    KEPT columns with no masking pass by two invariants:

    - unkept REAL columns sit ABOVE every kept distance (the locality
      mask keeps exactly the smallest distances of the row: ``dist <=
      thr`` with thr a per-row order statistic, or the keep_count
      smallest via _keep_mask), so they cannot win the min;
    - padded key columns cannot either: the coordinate kernels pad key
      coords with _PAD_COORD (squared distance ~1e30, far above any
      real threshold) and the prebuilt-dist TF kernels pad with
      _TF_BIG.

    Why shift at all: every scale this kernel family receives is
    non-negative (torch bandwidth_scale = tan of a [0, pi/2) angle; TF
    r^2), so the max kept logit of ``-s * dist`` is exactly
    ``-s * dmin`` and the shift restores the reference's max-subtracted
    softmax semantics exactly. Without it, a row whose nearest kept
    distance satisfies ``s * dmin > ~88`` (attainable: the learned
    torch bandwidth is unconstrained, tan blows up as sin(lmda) -> 1)
    silently became all-zero output with zero cotangent — a dead
    attention row that could not recover. With the shift such a row
    degrades to ~one-hot at the nearest kept column. Softmax is
    shift-invariant, so all downstream algebra in terms of p and the
    TRUE distances is unchanged, including the custom-VJP dScale
    formula. Fully-masked rows (padded output rows) shift by the
    resident min and zero out via the keep mask + denominator floor in
    _attention — they carry zero cotangent either way."""
    return dist - jnp.min(dist, axis=-1, keepdims=True)


def _attention(dsh, keep, s):
    """Masked softmax of ``-s * dist`` over the resident tile, taking the
    pre-shifted ``dsh = dist - dmin`` from _shifted_dist: the largest
    kept exponent is exactly 0, so the kept sum is >= 1 and a row with
    any kept column can never underflow to the denominator floor.
    Masked entries are exactly 0 (the where also discards inf/NaN exp
    operands from padded columns, e.g. ``s == 0`` times an overflowed
    ``-dsh * s``); fully-masked rows (padded output rows) get the
    denominator floor and output 0."""
    p = jnp.where(keep, jnp.exp(-dsh * s), 0.0)
    return p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)


def _attention_unnorm(dsh, keep, s):
    """:func:`_attention` with the normalization DEFERRED: returns the
    masked exponentials ``p`` and the per-row reciprocal denominator
    ``r`` so a forward kernel can compute ``(p @ v) * r`` — the division
    then touches a (rows, V) output slice instead of the (rows, band)
    attention tile. Saves one full-tile VPU pass per head; exactly equal
    to ``_attention(dsh, keep, s) @ v`` in f32 up to reassociation of
    the scalar multiply (the denominator floor semantics are identical)."""
    p = jnp.where(keep, jnp.exp(-dsh * s), 0.0)
    r = 1.0 / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    return p, r


def _make_fwd_kernel(H, D, space_dim, keep_count, L_in, with_thr, band_w):
    """``with_thr``: the per-row locality threshold is a precomputed input
    (per-sample meshes are constant across training, so thresholds are
    data — computed once at setup, ops/locality.py invariant) and the
    c-1 masked-min passes disappear from the hot path.

    ``band_w``: masked-tile skip (requires ``with_thr``). A per-(sample,
    row-tile) kept-column band start (ops/locality.batched_band_starts
    guarantees every kept column lies in [start, start+band_w)) restricts
    distances, softmax and the value contraction to a (TLo, band_w) slice
    of the row — at NACA's locality 0.02 on the spatially-ordered C-grid
    this is a 3x compute/transcendental reduction (band 256 vs padded
    row 768)."""

    def kernel(scale_ref, *refs):
        if band_w:
            start_ref, thr_ref, mq_ref, mk_ref, u_ref, out_ref = refs
        elif with_thr:
            thr_ref, mq_ref, mk_ref, u_ref, out_ref = refs
        else:
            mq_ref, mk_ref, u_ref, out_ref = refs
        mq = mq_ref[0]  # (TLo, d)
        if band_w:
            # starts live UNBLOCKED in SMEM (Mosaic requires block dims
            # 8/128-divisible OR equal to the array dims; a (1, n_tiles)
            # block is neither) — index by the grid position instead
            start = pl.multiple_of(
                start_ref[pl.program_id(0), pl.program_id(1)], 8
            )
            mk = mk_ref[0, pl.ds(start, band_w), :]  # (band_w, d)
            u = u_ref[0, pl.ds(start, band_w), :]  # (band_w, D)
        else:
            start = 0
            mk = mk_ref[0]  # (Li_p, d)
            u = u_ref[0]  # (Li_p, D)
        dist = _dist_tile(mq, mk, space_dim)
        col = (
            start + jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1) < L_in
        )
        if with_thr:
            keep = jnp.logical_and(dist <= thr_ref[0], col)
        else:
            keep = _keep_mask(dist, col, keep_count, L_in)
        dsh = _shifted_dist(dist)
        for h in range(H):
            att = _attention(dsh, keep, scale_ref[h, 0])
            out_ref[0, :, h * D : (h + 1) * D] = jnp.dot(
                att, u, preferred_element_type=jnp.float32
            )

    return kernel


def _tile_rows(L_out: int) -> int:
    """Output-row tile height shared by the kernels AND the setup-time band
    computation (ops/locality.batched_band_starts callers must tile with
    the same height the kernel will use). PIT_BATCHED_TLO overrides the
    default 256 (experiment knob: smaller tiles tighten kept-column bands
    at the cost of more grid cells; the kernels validate that setup-time
    band shapes used the same height)."""
    import os

    cap = int(os.environ.get("PIT_BATCHED_TLO", 256))
    return min(_round_up(L_out, 8), cap)


@functools.partial(
    jax.jit, static_argnames=("keep_count", "band_width", "interpret")
)
def _posatt_batched_raw(
    mesh_q, mesh_k, scale, u, thr=None, band_starts=None, *,
    keep_count, band_width=0, interpret=False,
):
    """(B, L_out, H*D) fused batched position attention.

    mesh_q: (B, L_out, d); mesh_k: (B, L_in, d); scale: (H, 1); u: (B, L_in, D);
    thr: optional precomputed per-row locality thresholds (B, L_out, 1);
    band_starts/band_width: optional kept-column band (B, n_tiles) int32 +
    static width — masked-tile skip, requires thr (see _make_fwd_kernel).
    """
    H = scale.shape[0]
    B, L_in, D = u.shape
    L_out, d = mesh_q.shape[1], mesh_q.shape[2]
    TLo = _tile_rows(L_out)
    Lo_p = _round_up(L_out, TLo)
    Li_p = _round_up(L_in, 128)
    n_tiles = Lo_p // TLo
    if band_starts is not None:
        if thr is None or not band_width:
            raise ValueError("band skip requires precomputed thresholds")
        if band_starts.shape != (B, n_tiles):
            raise ValueError(
                f"band_starts shape {band_starts.shape} != (B, n_tiles) = "
                f"({B}, {n_tiles}); the setup-time band computation must "
                f"tile with _tile_rows(L_out) = {TLo}"
            )

    mq_p = jnp.pad(mesh_q, ((0, 0), (0, Lo_p - L_out), (0, 0)))
    mk_p = jnp.pad(mesh_k, ((0, 0), (0, Li_p - L_in), (0, 0)),
                   constant_values=_PAD_COORD)
    u_p = jnp.pad(u, ((0, 0), (0, Li_p - L_in), (0, 0)))

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # (H, 1) scales
        pl.BlockSpec((1, TLo, d), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, Li_p, d), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, Li_p, D), lambda b, i: (b, 0, 0)),
    ]
    operands = [scale, mq_p, mk_p, u_p]
    if thr is not None:
        thr_p = jnp.pad(thr, ((0, 0), (0, Lo_p - L_out), (0, 0)))
        in_specs.insert(1, pl.BlockSpec((1, TLo, 1), lambda b, i: (b, i, 0)))
        operands.insert(1, thr_p)
    if band_starts is not None:
        in_specs.insert(1, pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.insert(1, band_starts)

    eff_li = band_width if band_starts is not None else Li_p
    grid = (B, n_tiles)
    out = pl.pallas_call(
        _make_fwd_kernel(
            H, D, d, keep_count, L_in, thr is not None,
            band_width if band_starts is not None else 0,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TLo, H * D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Lo_p, H * D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * H * B * Lo_p * eff_li
            * (D + d + (0 if thr is not None else keep_count)),
            bytes_accessed=4
            * (B * (Lo_p + Li_p) * d + B * Li_p * D + B * Lo_p * H * D),
            transcendentals=H * B * Lo_p * eff_li,
        ),
        interpret=interpret,
    )(*operands)
    return out[:, :L_out, :]


def _make_bwd_kernel(H, D, space_dim, keep_count, L_in, with_thr, band_w):
    def kernel(scale_ref, *refs):
        if band_w:
            (start_ref, thr_ref, mq_ref, mk_ref, u_ref, g_ref,
             du_ref, ds_ref, ds_acc) = refs
        elif with_thr:
            thr_ref, mq_ref, mk_ref, u_ref, g_ref, du_ref, ds_ref, ds_acc = refs
        else:
            mq_ref, mk_ref, u_ref, g_ref, du_ref, ds_ref, ds_acc = refs
        i, ni = pl.program_id(1), pl.num_programs(1)

        @pl.when(i == 0)
        def _init():
            du_ref[0] = jnp.zeros_like(du_ref[0])
            for h in range(H):  # SMEM accepts scalar stores only
                ds_acc[h, 0] = 0.0

        mq = mq_ref[0]
        if band_w:
            start = pl.multiple_of(start_ref[pl.program_id(0), i], 8)
            mk = mk_ref[0, pl.ds(start, band_w), :]
            u = u_ref[0, pl.ds(start, band_w), :]
        else:
            start = 0
            mk = mk_ref[0]
            u = u_ref[0]
        dist = _dist_tile(mq, mk, space_dim)
        col = (
            start + jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1) < L_in
        )
        if with_thr:
            keep = jnp.logical_and(dist <= thr_ref[0], col)
        else:
            keep = _keep_mask(dist, col, keep_count, L_in)
        dsh = _shifted_dist(dist)
        nd = jnp.where(keep, -dist, 0.0)
        for h in range(H):
            att = _attention(dsh, keep, scale_ref[h, 0])
            g = g_ref[0, :, h * D : (h + 1) * D]  # (TLo, D)
            # dValues: P^T @ G, accumulated over row tiles. dot_general
            # with contraction on the row axis — no explicit .T relayout.
            # Band: only rows [start, start+band_w) of dU receive mass
            # from this tile (att is zero-padded outside the band by
            # construction), so accumulate into the slice.
            dug = jax.lax.dot_general(
                att, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if band_w:
                du_ref[0, pl.ds(start, band_w), :] += dug
            else:
                du_ref[0] += dug
            # dScale: dL/dlogit = P*(T - r), dlogit/ds = -dist on kept
            # entries; T = G @ U^T via contraction on the feature axis.
            t = jax.lax.dot_general(
                g, u, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TLo, Li)
            pt = att * t
            r = jnp.sum(pt, axis=-1, keepdims=True)
            ds_acc[h, 0] += jnp.sum(pt * nd) - jnp.sum(
                r * jnp.sum(att * nd, axis=-1, keepdims=True)
            )

        @pl.when(i == ni - 1)
        def _fin():
            for h in range(H):
                ds_ref[0, 0, h] = ds_acc[h, 0]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("keep_count", "band_width", "interpret")
)
def _posatt_batched_bwd_raw(
    mesh_q, mesh_k, scale, u, g, thr=None, band_starts=None, *,
    keep_count, band_width=0, interpret=False,
):
    """(dU (B, L_in, D), dScale (B, H)) in one streaming pass."""
    H = scale.shape[0]
    B, L_in, D = u.shape
    L_out, d = mesh_q.shape[1], mesh_q.shape[2]
    TLo = _tile_rows(L_out)
    Lo_p = _round_up(L_out, TLo)
    Li_p = _round_up(L_in, 128)
    n_tiles = Lo_p // TLo
    if band_starts is not None and (thr is None or not band_width):
        raise ValueError("band skip requires precomputed thresholds")

    mq_p = jnp.pad(mesh_q, ((0, 0), (0, Lo_p - L_out), (0, 0)))
    mk_p = jnp.pad(mesh_k, ((0, 0), (0, Li_p - L_in), (0, 0)),
                   constant_values=_PAD_COORD)
    u_p = jnp.pad(u, ((0, 0), (0, Li_p - L_in), (0, 0)))
    # padded output rows carry zero cotangent -> no contribution
    g_p = jnp.pad(g, ((0, 0), (0, Lo_p - L_out), (0, 0)))

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, TLo, d), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, Li_p, d), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, Li_p, D), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, TLo, H * D), lambda b, i: (b, i, 0)),
    ]
    operands = [scale, mq_p, mk_p, u_p, g_p]
    if thr is not None:
        thr_p = jnp.pad(thr, ((0, 0), (0, Lo_p - L_out), (0, 0)))
        in_specs.insert(1, pl.BlockSpec((1, TLo, 1), lambda b, i: (b, i, 0)))
        operands.insert(1, thr_p)
    if band_starts is not None:
        in_specs.insert(1, pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.insert(1, band_starts)

    du, ds = pl.pallas_call(
        _make_bwd_kernel(
            H, D, d, keep_count, L_in, thr is not None,
            band_width if band_starts is not None else 0,
        ),
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, Li_p, D), lambda b, i: (b, 0, 0)),
            # dScale blocked (1, 1, H) and indexed by b: each grid step
            # owns its own batch row, so splitting b across TensorCores
            # (v4/v5p megacore) is safe AND b stays 'parallel' — marking
            # b 'arbitrary' instead measured a 1.79x NACA epoch
            # regression on v5e (65.9 -> 36.9 steps/s, 2026-08-18
            # same-session A/B). Shape (B, 1, H) not (B, H): Mosaic
            # requires the last two block dims divisible by (8, 128) OR
            # equal to the overall dims, and (1, H) satisfies neither
            # for small H.
            pl.BlockSpec(
                (1, 1, H), lambda b, i: (b, 0, 0), memory_space=pltpu.SMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Li_p, D), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, H), jnp.float32),
        ),
        scratch_shapes=[pltpu.SMEM((H, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    return du[:, :L_in, :], ds[:, 0, :]


# --- SPMD partitioning (multi-device meshes) ------------------------------
# Batch-dimension partitioning rules so the production data-parallel mesh
# (runner.train(mesh='data=N')) can shard these Mosaic custom calls: each
# device runs the unmodified kernel on its batch shard; the per-sample
# dScale output stays batch-leading, so its cross-device reduction is the
# ordinary jnp.sum in the VJP below (GSPMD inserts the all-reduce). See
# kernels/partitioning.py.
from position_induced_transformer_tpu.kernels.partitioning import (
    batch_partitioned,
)


def _multi_device() -> bool:
    # trace-time constant; on one device the raw call is identical and
    # skips the custom-partitioning indirection
    return len(jax.devices()) > 1


_fwd_part_thr = batch_partitioned(
    lambda mq, mk, s, u, thr, kc, interp: _posatt_batched_raw(
        mq, mk, s, u, thr, keep_count=kc, interpret=interp
    ),
    "b lo d, b li d, h one, b li f, b lo uno -> b lo g",
    static_argnums=(5, 6),
)
_fwd_part_nothr = batch_partitioned(
    lambda mq, mk, s, u, kc, interp: _posatt_batched_raw(
        mq, mk, s, u, None, keep_count=kc, interpret=interp
    ),
    "b lo d, b li d, h one, b li f -> b lo g",
    static_argnums=(4, 5),
)
_fwd_part_band = batch_partitioned(
    lambda mq, mk, s, u, thr, bs, kc, bw, interp: _posatt_batched_raw(
        mq, mk, s, u, thr, bs,
        keep_count=kc, band_width=bw, interpret=interp,
    ),
    "b lo d, b li d, h one, b li f, b lo uno, b t -> b lo g",
    static_argnums=(6, 7, 8),
)
_bwd_part_thr = batch_partitioned(
    lambda mq, mk, s, u, g, thr, kc, interp: _posatt_batched_bwd_raw(
        mq, mk, s, u, g, thr, keep_count=kc, interpret=interp
    ),
    "b lo d, b li d, h one, b li f, b lo g, b lo uno -> b li f2, b h2",
    static_argnums=(6, 7),
)
_bwd_part_nothr = batch_partitioned(
    lambda mq, mk, s, u, g, kc, interp: _posatt_batched_bwd_raw(
        mq, mk, s, u, g, None, keep_count=kc, interpret=interp
    ),
    "b lo d, b li d, h one, b li f, b lo g -> b li f2, b h2",
    static_argnums=(5, 6),
)
_bwd_part_band = batch_partitioned(
    lambda mq, mk, s, u, g, thr, bs, kc, bw, interp: _posatt_batched_bwd_raw(
        mq, mk, s, u, g, thr, bs,
        keep_count=kc, band_width=bw, interpret=interp,
    ),
    "b lo d, b li d, h one, b li f, b lo g, b lo uno, b t -> b li f2, b h2",
    static_argnums=(7, 8, 9),
)


def _fwd_dispatch(
    mesh_q, mesh_k, scale, u, thr, band_starts, keep_count, band_width,
    interpret,
):
    if _multi_device():
        if band_starts is not None:
            return _fwd_part_band(
                mesh_q, mesh_k, scale, u, thr, band_starts,
                keep_count, band_width, interpret,
            )
        if thr is None:
            return _fwd_part_nothr(
                mesh_q, mesh_k, scale, u, keep_count, interpret
            )
        return _fwd_part_thr(
            mesh_q, mesh_k, scale, u, thr, keep_count, interpret
        )
    return _posatt_batched_raw(
        mesh_q, mesh_k, scale, u, thr, band_starts,
        keep_count=keep_count, band_width=band_width, interpret=interpret,
    )


def _bwd_dispatch(
    mesh_q, mesh_k, scale, u, g, thr, band_starts, keep_count, band_width,
    interpret,
):
    if _multi_device():
        if band_starts is not None:
            return _bwd_part_band(
                mesh_q, mesh_k, scale, u, g, thr, band_starts,
                keep_count, band_width, interpret,
            )
        if thr is None:
            return _bwd_part_nothr(
                mesh_q, mesh_k, scale, u, g, keep_count, interpret
            )
        return _bwd_part_thr(
            mesh_q, mesh_k, scale, u, g, thr, keep_count, interpret
        )
    return _posatt_batched_bwd_raw(
        mesh_q, mesh_k, scale, u, g, thr, band_starts,
        keep_count=keep_count, band_width=band_width, interpret=interpret,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _posatt_batched(
    mesh_q, mesh_k, scale, u, thr, band_starts, keep_count,
    band_width=0, interpret=False,
):
    return _fwd_dispatch(
        mesh_q, mesh_k, scale, u, thr, band_starts, keep_count,
        band_width, interpret,
    )


def _posatt_batched_fwd(
    mesh_q, mesh_k, scale, u, thr, band_starts, keep_count, band_width,
    interpret,
):
    out = _fwd_dispatch(
        mesh_q, mesh_k, scale, u, thr, band_starts, keep_count,
        band_width, interpret,
    )
    return out, (mesh_q, mesh_k, scale, u, thr, band_starts)


def _posatt_batched_bwd(keep_count, band_width, interpret, residuals, g):
    mesh_q, mesh_k, scale, u, thr, band_starts = residuals
    du, ds = _bwd_dispatch(
        mesh_q, mesh_k, scale, u, g, thr, band_starts, keep_count,
        band_width, interpret,
    )
    dscale = jnp.sum(ds, axis=0).reshape(scale.shape)
    return None, None, dscale, du, None, None


_posatt_batched.defvjp(_posatt_batched_fwd, _posatt_batched_bwd)


def _make_tf_fwd_kernel(H, V, L_in, L_out, TLo, with_thr):
    """TF-semantics forward: logits = -dist * s_h over a PRE-BUILT batched
    distance tile, per-head values folded on the last axis (B, Li, H*V).
    The (B, H, L, L) attention tensors never exist in HBM."""

    def kernel(scale_ref, *refs):
        if with_thr:
            thr_ref, dist_ref, v_ref, out_ref = refs
        else:
            dist_ref, v_ref, out_ref = refs
        dist = dist_ref[0]  # (TLo, Li_p)
        col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1) < L_in
        # padded ROWS must be masked out too: their dist is _TF_BIG, and
        # -_TF_BIG * s overflows f32 to -inf for s > ~1.0008 (learned r^2
        # crosses 1 routinely); with no masked column to anchor the row
        # max at _NEG, the softmax would be exp(-inf + inf) = NaN and the
        # backward's row contractions would spread it via NaN * 0.
        row = (
            jax.lax.broadcasted_iota(jnp.int32, dist.shape, 0)
            + pl.program_id(1) * TLo
            < L_out
        )
        keep = jnp.logical_and(col, row)
        if with_thr:
            keep = jnp.logical_and(dist <= thr_ref[0], keep)
        dsh = _shifted_dist(dist)
        v = v_ref[0]
        for h in range(H):
            att = _attention(dsh, keep, scale_ref[h, 0])
            out_ref[0, :, h * V : (h + 1) * V] = jnp.dot(
                att, v[:, h * V : (h + 1) * V],
                preferred_element_type=jnp.float32,
            )

    return kernel


def _make_tf_bwd_kernel(H, V, L_in, L_out, TLo, with_thr):
    def kernel(scale_ref, *refs):
        if with_thr:
            thr_ref, dist_ref, v_ref, g_ref, dv_ref, ds_ref, ds_acc = refs
        else:
            dist_ref, v_ref, g_ref, dv_ref, ds_ref, ds_acc = refs
        i, ni = pl.program_id(1), pl.num_programs(1)

        @pl.when(i == 0)
        def _init():
            dv_ref[0] = jnp.zeros_like(dv_ref[0])
            for h in range(H):
                ds_acc[h, 0] = 0.0

        dist = dist_ref[0]
        col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1) < L_in
        row = (
            jax.lax.broadcasted_iota(jnp.int32, dist.shape, 0)
            + pl.program_id(1) * TLo
            < L_out
        )  # see the forward kernel on why padded rows must be masked
        keep = jnp.logical_and(col, row)
        if with_thr:
            keep = jnp.logical_and(dist <= thr_ref[0], keep)
        dsh = _shifted_dist(dist)
        nd = jnp.where(keep, -dist, 0.0)
        for h in range(H):
            att = _attention(dsh, keep, scale_ref[h, 0])
            g = g_ref[0, :, h * V : (h + 1) * V]  # (TLo, V)
            dv_ref[0, :, h * V : (h + 1) * V] += jax.lax.dot_general(
                att, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            t = jax.lax.dot_general(
                g, v_ref[0, :, h * V : (h + 1) * V],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TLo, Li_p)
            pt = att * t
            r = jnp.sum(pt, axis=-1, keepdims=True)
            ds_acc[h, 0] += jnp.sum(pt * nd) - jnp.sum(
                r * jnp.sum(att * nd, axis=-1, keepdims=True)
            )

        @pl.when(i == ni - 1)
        def _fin():
            for h in range(H):
                ds_ref[0, 0, h] = ds_acc[h, 0]

    return kernel


_TF_BIG = 3.4e38  # padding distance: finite (s * inf would NaN at s == 0)


def _tf_pad(dist, thr, values, TLo):
    B, L_out, L_in = dist.shape
    Lo_p = _round_up(L_out, TLo)
    Li_p = _round_up(L_in, 128)
    dist_p = jnp.pad(
        dist, ((0, 0), (0, Lo_p - L_out), (0, Li_p - L_in)),
        constant_values=_TF_BIG,
    )
    v_p = jnp.pad(values, ((0, 0), (0, Li_p - L_in), (0, 0)))
    thr_p = (
        None
        if thr is None
        else jnp.pad(thr, ((0, 0), (0, Lo_p - L_out), (0, 0)))
    )
    return dist_p, thr_p, v_p, Lo_p, Li_p


@functools.partial(jax.jit, static_argnames=("interpret",))
def _posatt_tf_raw(dist, thr, scale, values, *, interpret=False):
    """(B, L_out, H*V): streaming softmax(-dist * s_h) @ values_h.

    dist: (B, L_out, L_in) pre-built per-sample distances; thr: optional
    (B, L_out, 1); scale: (H, 1) non-negative; values: (B, L_in, H*V).
    """
    H = scale.shape[0]
    B, L_out, L_in = dist.shape
    HV = values.shape[-1]
    if HV % H:
        raise ValueError(
            f"values feature dim {HV} is not divisible by n_head {H}; "
            "the per-head output slices would leave trailing columns "
            "UNWRITTEN (uninitialized memory, not an error)"
        )
    V = HV // H
    TLo = min(_round_up(L_out, 8), 256)
    dist_p, thr_p, v_p, Lo_p, Li_p = _tf_pad(dist, thr, values, TLo)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, TLo, Li_p), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, Li_p, HV), lambda b, i: (b, 0, 0)),
    ]
    operands = [scale, dist_p, v_p]
    if thr_p is not None:
        in_specs.insert(1, pl.BlockSpec((1, TLo, 1), lambda b, i: (b, i, 0)))
        operands.insert(1, thr_p)
    out = pl.pallas_call(
        _make_tf_fwd_kernel(H, V, L_in, L_out, TLo, thr_p is not None),
        grid=(B, Lo_p // TLo),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TLo, HV), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Lo_p, HV), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Lo_p * Li_p * HV + 5 * H * B * Lo_p * Li_p,
            bytes_accessed=4
            * (B * Lo_p * Li_p + B * Li_p * HV + B * Lo_p * HV),
            transcendentals=H * B * Lo_p * Li_p,
        ),
        interpret=interpret,
    )(*operands)
    return out[:, :L_out, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _posatt_tf_bwd_raw(dist, thr, scale, values, g, *, interpret=False):
    """(dValues (B, L_in, H*V), dScale (B, H)) in one streaming pass."""
    H = scale.shape[0]
    B, L_out, L_in = dist.shape
    HV = values.shape[-1]
    if HV % H:
        raise ValueError(
            f"values feature dim {HV} is not divisible by n_head {H} "
            "(trailing dValues columns would be uninitialized)"
        )
    V = HV // H
    TLo = min(_round_up(L_out, 8), 256)
    dist_p, thr_p, v_p, Lo_p, Li_p = _tf_pad(dist, thr, values, TLo)
    g_p = jnp.pad(g, ((0, 0), (0, Lo_p - L_out), (0, 0)))

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, TLo, Li_p), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, Li_p, HV), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, TLo, HV), lambda b, i: (b, i, 0)),
    ]
    operands = [scale, dist_p, v_p, g_p]
    if thr_p is not None:
        in_specs.insert(1, pl.BlockSpec((1, TLo, 1), lambda b, i: (b, i, 0)))
        operands.insert(1, thr_p)
    dv, ds = pl.pallas_call(
        _make_tf_bwd_kernel(H, V, L_in, L_out, TLo, thr_p is not None),
        grid=(B, Lo_p // TLo),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, Li_p, HV), lambda b, i: (b, 0, 0)),
            # (1, 1, H) dScale block indexed by b: megacore-safe with b
            # 'parallel' — see the coordinate bwd kernel above
            pl.BlockSpec(
                (1, 1, H), lambda b, i: (b, 0, 0), memory_space=pltpu.SMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Li_p, HV), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, H), jnp.float32),
        ),
        scratch_shapes=[pltpu.SMEM((H, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    return dv[:, :L_in, :], ds[:, 0, :]


# same batch-dim partitioning story as the coordinate kernels above: the
# pre-built per-sample distances are batch-leading too
_tf_fwd_part_thr = batch_partitioned(
    lambda dist, thr, s, v, interp: _posatt_tf_raw(
        dist, thr, s, v, interpret=interp
    ),
    "b lo li, b lo uno, h one, b li f -> b lo g",
    static_argnums=(4,),
)
_tf_fwd_part_nothr = batch_partitioned(
    lambda dist, s, v, interp: _posatt_tf_raw(
        dist, None, s, v, interpret=interp
    ),
    "b lo li, h one, b li f -> b lo g",
    static_argnums=(3,),
)
_tf_bwd_part_thr = batch_partitioned(
    lambda dist, thr, s, v, g, interp: _posatt_tf_bwd_raw(
        dist, thr, s, v, g, interpret=interp
    ),
    "b lo li, b lo uno, h one, b li f, b lo g -> b li f2, b h2",
    static_argnums=(5,),
)
_tf_bwd_part_nothr = batch_partitioned(
    lambda dist, s, v, g, interp: _posatt_tf_bwd_raw(
        dist, None, s, v, g, interpret=interp
    ),
    "b lo li, h one, b li f, b lo g -> b li f2, b h2",
    static_argnums=(4,),
)


def _tf_fwd_dispatch(dist, thr, scale, values, interpret):
    if _multi_device():
        if thr is None:
            return _tf_fwd_part_nothr(dist, scale, values, interpret)
        return _tf_fwd_part_thr(dist, thr, scale, values, interpret)
    return _posatt_tf_raw(dist, thr, scale, values, interpret=interpret)


def _tf_bwd_dispatch(dist, thr, scale, values, g, interpret):
    if _multi_device():
        if thr is None:
            return _tf_bwd_part_nothr(dist, scale, values, g, interpret)
        return _tf_bwd_part_thr(dist, thr, scale, values, g, interpret)
    return _posatt_tf_bwd_raw(
        dist, thr, scale, values, g, interpret=interpret
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _posatt_tf(dist, thr, scale, values, interpret=False):
    return _tf_fwd_dispatch(dist, thr, scale, values, interpret)


def _posatt_tf_fwd(dist, thr, scale, values, interpret):
    out = _tf_fwd_dispatch(dist, thr, scale, values, interpret)
    return out, (dist, thr, scale, values)


def _posatt_tf_bwd(interpret, residuals, g):
    dist, thr, scale, values = residuals
    dv, ds = _tf_bwd_dispatch(dist, thr, scale, values, g, interpret)
    dscale = jnp.sum(ds, axis=0).reshape(scale.shape)
    return None, None, dscale, dv


_posatt_tf.defvjp(_posatt_tf_fwd, _posatt_tf_bwd)


def position_attention_batched_dist(
    dist: jnp.ndarray,
    scales: jnp.ndarray,
    values: jnp.ndarray,
    thr: jnp.ndarray | None = None,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """TF-semantics fused batched position attention over PRE-BUILT
    per-sample distances (reference: tensorflow/5_Elasticity/utils.py:60-103
    MultiHeadPosAtt on (B, L, L) distances): softmax(-dist * s_h) @ V_h with
    per-head values folded on the last axis.

    dist: (B, L_out, L_in); scales: (H, 1) NON-NEGATIVE per-head scales
    (e.g. r^2); values: (B, L_in, H*V) — per-head value projections,
    computed outside (one XLA einsum); thr: optional (B, L_out, 1) locality
    thresholds on the raw distances (None = global attention). Returns
    (B, L_out, H*V). Differentiable in ``scales`` and ``values``
    (fully-fused streaming backward); dist/thr are treated as constants
    (they derive from input coordinates, not parameters).
    """
    return _posatt_tf(dist, thr, scales, values, interpret)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BandSpec:
    """Kept-column band for the masked-tile skip: per-(sample, row-tile)
    8-aligned start columns plus the common static width. Produced at setup
    by ops/locality.batched_band_starts (which must tile with
    :func:`band_tile_rows`); carried through the Geometry pytree and
    gathered with the batch like the per-sample thresholds.

    ``wrap``: circular-band margin. For clouds ordered along a CLOSED
    curve (elasticity annulus sorted by angle) the kept columns of a
    seam-straddling tile wrap around the index space; the caller appends
    the first ``wrap`` keys/values again (one XLA concat — its transpose
    routes the duplicated dValues back automatically) so every band is a
    plain linear window of the extended axis. ``width < L_k`` guarantees
    no window ever sees both copies of a key (batched_band_starts
    enforces it), so the softmax is exact."""

    starts: Any  # (B, n_tiles) int32
    width: int  # static: lane-aligned band width
    wrap: int = 0  # static: circular margin appended to the key axis

    def tree_flatten(self):
        return (self.starts,), (self.width, self.wrap)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def band_tile_rows(L_out: int) -> int:
    """The output-row tile height the batched kernels will use for this
    L_out — setup-time band computations must tile with the same value."""
    return _tile_rows(L_out)


def position_attention_batched(
    mesh_q: jnp.ndarray,
    mesh_k: jnp.ndarray,
    lmda: jnp.ndarray,
    inputs: jnp.ndarray,
    locality: float,
    thr: jnp.ndarray | None = None,
    band: "BandSpec | None" = None,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused batched drop-in for ``ops.posatt.position_attention`` when the
    distance matrix would be built per sample inside the step: takes raw
    mesh coordinates (B, L_out, d)/(B, L_in, d) and returns (B, L_out, H*D).

    (A bf16-MXU forward option was removed after measurement — round 3:
    default-precision f32 jnp.dot already lowers to a single bf16 MXU pass
    with f32 accumulation on v5e, so the casts were bit-identical no-ops;
    BASELINE.md.)

    ``thr``: optional precomputed per-row locality thresholds (B, L_out, 1)
    — per-sample meshes are constant across training, so the c-th-smallest
    threshold is data, not computation; passing it removes the c-1
    masked-min passes from both the forward and backward kernels (the keep
    mask ``dist <= thr`` is identical either way).

    ``band``: optional :class:`BandSpec` kept-column band (requires
    ``thr``): restricts every tile's distances/softmax/contraction to the
    setup-computed (tile_rows, band.width) kept-column slice — the
    masked-tile skip that exploits locality 0.02 leaving 98% of each row
    masked (ops/locality.batched_band_starts).

    Locality semantics match the top-k equivalence of the reference's
    quantile mask (ops/locality.py); Euclidean metric only.
    """
    H = lmda.shape[0]
    B, L_out = inputs.shape[0], mesh_q.shape[1]
    keep_count = topk_keep_count(mesh_k.shape[1], locality)
    if band is not None and thr is None:
        raise ValueError(
            "band skip requires precomputed thresholds (the band start "
            "arrays are only valid for the thr they were computed from)"
        )
    if thr is None and locality < 1.0 and keep_count > 32:
        # the in-kernel keep mask unrolls keep_count-1 masked-min passes at
        # trace time — fine for the reference localities (c = 3-20) but a
        # program-size blowup for large keep fractions. Compute the per-row
        # threshold outside the kernel instead (one XLA top_k over the
        # materialized distances; mirrors ops/locality.topk_threshold's
        # c<=32 cut-over) and hand it in.
        from position_induced_transformer_tpu.ops.distances import (
            euclidean_sq,
        )
        from position_induced_transformer_tpu.ops.locality import (
            robust_topk_threshold,
        )

        dist = euclidean_sq(mesh_q, mesh_k)
        # wide-gap midpoint: kept set invariant to ulp differences vs the
        # kernel's in-VMEM distance recomputation (even on tied rows)
        thr = robust_topk_threshold(dist, locality)
    scale = bandwidth_scale(lmda).reshape(H, 1)
    if band is not None and band.wrap:
        # circular band: duplicate the leading wrap-margin keys/values on
        # the end of the key axis (BandSpec docstring); autodiff routes
        # the duplicated dValues back through the concat adjoint
        mesh_k = jnp.concatenate([mesh_k, mesh_k[:, : band.wrap]], axis=1)
        inputs = jnp.concatenate([inputs, inputs[:, : band.wrap]], axis=1)
    out = _posatt_batched(
        mesh_q, mesh_k, scale, inputs, thr,
        None if band is None else band.starts,
        keep_count, 0 if band is None else band.width, interpret,
    )
    assert out.shape == (B, L_out, H * inputs.shape[-1])
    return out


# --- TF-semantics kernels over RAW COORDINATES --------------------------
# The TF point-cloud model (elasticity_tf) builds one (B, L, L) dist^2/2
# matrix per forward and every attention op re-reads it — 37 MB per batch
# at L=972 that the pre-built-dist kernel above still streams from HBM.
# These variants compute the distances IN-KERNEL from the (B, L, 2)
# coordinates (same op order as models/pit_tf.pairwise_dist_half:
# diff -> square -> sum -> * 0.5), so on the fused path the distance
# tensor never exists anywhere. Per-head values/output layout and scale
# semantics match position_attention_batched_dist; the kept-column band
# skip (BandSpec, incl. circular wrap) composes exactly as in the
# coordinate kernel above.


def _make_tf_coord_fwd_kernel(H, V, space_dim, L_in, with_thr, band_w):
    def kernel(scale_ref, *refs):
        if band_w:
            start_ref, thr_ref, mq_ref, mk_ref, v_ref, out_ref = refs
        elif with_thr:
            thr_ref, mq_ref, mk_ref, v_ref, out_ref = refs
        else:
            mq_ref, mk_ref, v_ref, out_ref = refs
        mq = mq_ref[0]
        if band_w:
            start = pl.multiple_of(
                start_ref[pl.program_id(0), pl.program_id(1)], 8
            )
            mk = mk_ref[0, pl.ds(start, band_w), :]
            v = v_ref[0, pl.ds(start, band_w), :]
        else:
            start = 0
            mk = mk_ref[0]
            v = v_ref[0]
        # the TF 0.5 halving is folded into scale/thr by the caller
        # (position_attention_batched_tf_coords) — one VPU pass saved
        dist = _dist_tile(mq, mk, space_dim)
        col = (
            start + jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1) < L_in
        )
        keep = col
        if with_thr:
            keep = jnp.logical_and(dist <= thr_ref[0], keep)
        dsh = _shifted_dist(dist)
        for h in range(H):
            # deferred normalization: at H=8 heads (elasticity_tf) the
            # per-head full-tile divide is a material share of the VPU
            # work this kernel is bound by (ROOFLINE elasticity_tf row)
            p, r = _attention_unnorm(dsh, keep, scale_ref[h, 0])
            out_ref[0, :, h * V : (h + 1) * V] = r * jnp.dot(
                p, v[:, h * V : (h + 1) * V],
                preferred_element_type=jnp.float32,
            )

    return kernel


def _make_tf_coord_bwd_kernel(H, V, space_dim, L_in, with_thr, band_w):
    def kernel(scale_ref, *refs):
        if band_w:
            (start_ref, thr_ref, mq_ref, mk_ref, v_ref, g_ref,
             dv_ref, ds_ref, ds_acc) = refs
        elif with_thr:
            (thr_ref, mq_ref, mk_ref, v_ref, g_ref,
             dv_ref, ds_ref, ds_acc) = refs
        else:
            mq_ref, mk_ref, v_ref, g_ref, dv_ref, ds_ref, ds_acc = refs
        i, ni = pl.program_id(1), pl.num_programs(1)

        @pl.when(i == 0)
        def _init():
            dv_ref[0] = jnp.zeros_like(dv_ref[0])
            for h in range(H):
                ds_acc[h, 0] = 0.0

        mq = mq_ref[0]
        if band_w:
            start = pl.multiple_of(start_ref[pl.program_id(0), i], 8)
            mk = mk_ref[0, pl.ds(start, band_w), :]
            v = v_ref[0, pl.ds(start, band_w), :]
        else:
            start = 0
            mk = mk_ref[0]
            v = v_ref[0]
        dist = _dist_tile(mq, mk, space_dim)  # halving folded into scale
        col = (
            start + jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1) < L_in
        )
        keep = col
        if with_thr:
            keep = jnp.logical_and(dist <= thr_ref[0], keep)
        dsh = _shifted_dist(dist)
        nd = jnp.where(keep, -dist, 0.0)
        for h in range(H):
            att = _attention(dsh, keep, scale_ref[h, 0])
            g = g_ref[0, :, h * V : (h + 1) * V]
            dvg = jax.lax.dot_general(
                att, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if band_w:
                dv_ref[0, pl.ds(start, band_w), h * V : (h + 1) * V] += dvg
            else:
                dv_ref[0, :, h * V : (h + 1) * V] += dvg
            t = jax.lax.dot_general(
                g, v[:, h * V : (h + 1) * V], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            pt = att * t
            r = jnp.sum(pt, axis=-1, keepdims=True)
            ds_acc[h, 0] += jnp.sum(pt * nd) - jnp.sum(
                r * jnp.sum(att * nd, axis=-1, keepdims=True)
            )

        @pl.when(i == ni - 1)
        def _fin():
            for h in range(H):
                ds_ref[0, 0, h] = ds_acc[h, 0]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("band_width", "interpret")
)
def _posatt_tf_coord_raw(
    mesh_q, mesh_k, scale, values, thr=None, band_starts=None, *,
    band_width=0, interpret=False,
):
    """(B, L_out, H*V) TF-semantics attention from raw coordinates."""
    H = scale.shape[0]
    B, L_in, HV = values.shape
    L_out, d = mesh_q.shape[1], mesh_q.shape[2]
    if HV % H:
        raise ValueError(
            f"values feature dim {HV} not divisible by n_head {H}"
        )
    V = HV // H
    TLo = _tile_rows(L_out)
    Lo_p = _round_up(L_out, TLo)
    Li_p = _round_up(L_in, 128)
    n_tiles = Lo_p // TLo
    if band_starts is not None and (thr is None or not band_width):
        raise ValueError("band skip requires precomputed thresholds")

    mq_p = jnp.pad(mesh_q, ((0, 0), (0, Lo_p - L_out), (0, 0)))
    mk_p = jnp.pad(mesh_k, ((0, 0), (0, Li_p - L_in), (0, 0)),
                   constant_values=_PAD_COORD)
    v_p = jnp.pad(values, ((0, 0), (0, Li_p - L_in), (0, 0)))

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, TLo, d), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, Li_p, d), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, Li_p, HV), lambda b, i: (b, 0, 0)),
    ]
    operands = [scale, mq_p, mk_p, v_p]
    if thr is not None:
        thr_p = jnp.pad(thr, ((0, 0), (0, Lo_p - L_out), (0, 0)))
        in_specs.insert(1, pl.BlockSpec((1, TLo, 1), lambda b, i: (b, i, 0)))
        operands.insert(1, thr_p)
    if band_starts is not None:
        in_specs.insert(1, pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.insert(1, band_starts)

    eff_li = band_width if band_starts is not None else Li_p
    out = pl.pallas_call(
        _make_tf_coord_fwd_kernel(
            H, V, d, L_in, thr is not None,
            band_width if band_starts is not None else 0,
        ),
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TLo, HV), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Lo_p, HV), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Lo_p * eff_li * (HV + d) + 5 * H * B * Lo_p * eff_li,
            bytes_accessed=4
            * (B * (Lo_p + Li_p) * d + B * Li_p * HV + B * Lo_p * HV),
            transcendentals=H * B * Lo_p * eff_li,
        ),
        interpret=interpret,
    )(*operands)
    return out[:, :L_out, :]


@functools.partial(
    jax.jit, static_argnames=("band_width", "interpret")
)
def _posatt_tf_coord_bwd_raw(
    mesh_q, mesh_k, scale, values, g, thr=None, band_starts=None, *,
    band_width=0, interpret=False,
):
    H = scale.shape[0]
    B, L_in, HV = values.shape
    L_out, d = mesh_q.shape[1], mesh_q.shape[2]
    V = HV // H
    TLo = _tile_rows(L_out)
    Lo_p = _round_up(L_out, TLo)
    Li_p = _round_up(L_in, 128)
    n_tiles = Lo_p // TLo

    mq_p = jnp.pad(mesh_q, ((0, 0), (0, Lo_p - L_out), (0, 0)))
    mk_p = jnp.pad(mesh_k, ((0, 0), (0, Li_p - L_in), (0, 0)),
                   constant_values=_PAD_COORD)
    v_p = jnp.pad(values, ((0, 0), (0, Li_p - L_in), (0, 0)))
    g_p = jnp.pad(g, ((0, 0), (0, Lo_p - L_out), (0, 0)))

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, TLo, d), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, Li_p, d), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, Li_p, HV), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, TLo, HV), lambda b, i: (b, i, 0)),
    ]
    operands = [scale, mq_p, mk_p, v_p, g_p]
    if thr is not None:
        thr_p = jnp.pad(thr, ((0, 0), (0, Lo_p - L_out), (0, 0)))
        in_specs.insert(1, pl.BlockSpec((1, TLo, 1), lambda b, i: (b, i, 0)))
        operands.insert(1, thr_p)
    if band_starts is not None:
        in_specs.insert(1, pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.insert(1, band_starts)

    dv, ds = pl.pallas_call(
        _make_tf_coord_bwd_kernel(
            H, V, d, L_in, thr is not None,
            band_width if band_starts is not None else 0,
        ),
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, Li_p, HV), lambda b, i: (b, 0, 0)),
            pl.BlockSpec(
                (1, 1, H), lambda b, i: (b, 0, 0), memory_space=pltpu.SMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Li_p, HV), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, H), jnp.float32),
        ),
        scratch_shapes=[pltpu.SMEM((H, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    return dv[:, :L_in, :], ds[:, 0, :]


_tfc_fwd_part_thr = batch_partitioned(
    lambda mq, mk, s, v, thr, interp: _posatt_tf_coord_raw(
        mq, mk, s, v, thr, interpret=interp
    ),
    "b lo d, b li d, h one, b li f, b lo uno -> b lo g",
    static_argnums=(5,),
)
_tfc_fwd_part_nothr = batch_partitioned(
    lambda mq, mk, s, v, interp: _posatt_tf_coord_raw(
        mq, mk, s, v, None, interpret=interp
    ),
    "b lo d, b li d, h one, b li f -> b lo g",
    static_argnums=(4,),
)
_tfc_fwd_part_band = batch_partitioned(
    lambda mq, mk, s, v, thr, bs, bw, interp: _posatt_tf_coord_raw(
        mq, mk, s, v, thr, bs, band_width=bw, interpret=interp
    ),
    "b lo d, b li d, h one, b li f, b lo uno, b t -> b lo g",
    static_argnums=(6, 7),
)
_tfc_bwd_part_thr = batch_partitioned(
    lambda mq, mk, s, v, g, thr, interp: _posatt_tf_coord_bwd_raw(
        mq, mk, s, v, g, thr, interpret=interp
    ),
    "b lo d, b li d, h one, b li f, b lo g, b lo uno -> b li f2, b h2",
    static_argnums=(6,),
)
_tfc_bwd_part_nothr = batch_partitioned(
    lambda mq, mk, s, v, g, interp: _posatt_tf_coord_bwd_raw(
        mq, mk, s, v, g, None, interpret=interp
    ),
    "b lo d, b li d, h one, b li f, b lo g -> b li f2, b h2",
    static_argnums=(5,),
)
_tfc_bwd_part_band = batch_partitioned(
    lambda mq, mk, s, v, g, thr, bs, bw, interp: _posatt_tf_coord_bwd_raw(
        mq, mk, s, v, g, thr, bs, band_width=bw, interpret=interp
    ),
    "b lo d, b li d, h one, b li f, b lo g, b lo uno, b t -> b li f2, b h2",
    static_argnums=(7, 8),
)


def _tfc_fwd_dispatch(mq, mk, scale, v, thr, bs, bw, interpret):
    if _multi_device():
        if bs is not None:
            return _tfc_fwd_part_band(mq, mk, scale, v, thr, bs, bw, interpret)
        if thr is None:
            return _tfc_fwd_part_nothr(mq, mk, scale, v, interpret)
        return _tfc_fwd_part_thr(mq, mk, scale, v, thr, interpret)
    return _posatt_tf_coord_raw(
        mq, mk, scale, v, thr, bs, band_width=bw, interpret=interpret
    )


def _tfc_bwd_dispatch(mq, mk, scale, v, g, thr, bs, bw, interpret):
    if _multi_device():
        if bs is not None:
            return _tfc_bwd_part_band(
                mq, mk, scale, v, g, thr, bs, bw, interpret
            )
        if thr is None:
            return _tfc_bwd_part_nothr(mq, mk, scale, v, g, interpret)
        return _tfc_bwd_part_thr(mq, mk, scale, v, g, thr, interpret)
    return _posatt_tf_coord_bwd_raw(
        mq, mk, scale, v, g, thr, bs, band_width=bw, interpret=interpret
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _posatt_tf_coord(mq, mk, scale, values, thr, band_starts, band_width=0,
                     interpret=False):
    return _tfc_fwd_dispatch(
        mq, mk, scale, values, thr, band_starts, band_width, interpret
    )


def _posatt_tf_coord_fwd(mq, mk, scale, values, thr, band_starts,
                         band_width, interpret):
    out = _tfc_fwd_dispatch(
        mq, mk, scale, values, thr, band_starts, band_width, interpret
    )
    return out, (mq, mk, scale, values, thr, band_starts)


def _posatt_tf_coord_bwd(band_width, interpret, residuals, g):
    mq, mk, scale, values, thr, band_starts = residuals
    dv, ds = _tfc_bwd_dispatch(
        mq, mk, scale, values, g, thr, band_starts, band_width, interpret
    )
    dscale = jnp.sum(ds, axis=0).reshape(scale.shape)
    return None, None, dscale, dv, None, None


_posatt_tf_coord.defvjp(_posatt_tf_coord_fwd, _posatt_tf_coord_bwd)


def position_attention_batched_tf_coords(
    coords_q: jnp.ndarray,
    coords_k: jnp.ndarray,
    scales: jnp.ndarray,
    values: jnp.ndarray,
    thr: jnp.ndarray | None = None,
    band: "BandSpec | None" = None,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """TF-semantics fused attention DIRECTLY from point-cloud coordinates
    (reference: tensorflow/5_Elasticity/utils.py:60-103 computes
    softmax(-dist^2/2 * r_h^2) @ V_h over per-sample distances): the
    distance matrix is built tile-resident in VMEM with the exact
    ``pairwise_dist_half`` op order, so neither the (B, L, L) distances
    nor the (B, H, L, L) attention tensors ever exist in HBM.

    coords_q: (B, L_out, d); coords_k: (B, L_in, d); scales: (H, 1)
    non-negative (e.g. r^2); values: (B, L_in, H*V) per-head folded; thr:
    optional (B, L_out, 1) thresholds ON THE HALVED distances; band:
    optional kept-column :class:`BandSpec` (requires thr; circular wrap
    supported). Differentiable in (scales, values).
    """
    if band is not None and thr is None:
        raise ValueError("band skip requires precomputed thresholds")
    if band is not None and band.wrap:
        coords_k = jnp.concatenate(
            [coords_k, coords_k[:, : band.wrap]], axis=1
        )
        values = jnp.concatenate([values, values[:, : band.wrap]], axis=1)
    # fold the dist^2/2 halving into the scale and threshold OUTSIDE the
    # custom VJP: logits and keep mask are identical, the kernel skips a
    # VPU pass, and autodiff chains dScales through the 0.5 factor
    return _posatt_tf_coord(
        coords_q, coords_k, 0.5 * scales, values,
        None if thr is None else 2.0 * thr,
        None if band is None else band.starts,
        0 if band is None else band.width, interpret,
    )
