"""Fused position-attention Pallas TPU kernel.

The single native-code obligation of this framework (SURVEY.md §2): the
reference's hot op — pairwise-distance attention (scale -> locality mask ->
softmax -> value contraction, reference: pit.py:46-57) — as one fused kernel
that never materializes the (L_out, L_in) attention matrix in HBM.

Design (flash-attention-style streaming softmax):

- Grid ``(H, B, Lo/TLo, Li/TLi)`` with the last axis a reduction
  ("arbitrary" semantics); VMEM scratch carries the running row max ``m``,
  normalizer ``l`` and accumulator ``acc`` across the Li tiles.
- The locality mask is applied in-kernel from a precomputed per-row
  quantile **threshold** (L_out, 1) — valid because the threshold is
  independent of the learnable bandwidth (ops/locality.py) — so the kernel
  reads O(Lo*Li) distances once and writes only the (Lo, D) output tile:
  HBM traffic drops from 3x (logits out + in + output) to ~1x vs the XLA
  path, which is the dominant cost since this op is bandwidth-bound at the
  reference's head dims.
- Masked logits use a large-negative sentinel; tiles that are fully masked
  are neutralized by the online-softmax rescale (every row keeps >= 1 entry
  globally, since a quantile threshold is >= the row minimum).
- Backward pass (custom VJP): fully fused by default. The forward saves
  only the softmax row statistics (M, L) — O(H*L_out), not the O(L_out*
  L_in) attention matrix — and two streaming kernels recompute attention
  tiles from them: ``_posatt_bwd_du`` (dValues = sum_h P^T @ G, batch
  folded) and ``_posatt_bwd_dscale`` (the bandwidth gradient collapses to
  per-row sums r, v, w accumulated in one pass: ds = sum_i (w_i - r_i
  v_i)). ``fused_bwd=False`` falls back to an XLA recompute that
  materializes A.

The pure-jnp oracle lives in ops/posatt.py; tests/test_pallas.py checks
bit-level agreement in interpret mode (CPU) and on TPU when available.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from position_induced_transformer_tpu.ops.locality import quantile_threshold
from position_induced_transformer_tpu.ops.posatt import bandwidth_scale

_NEG = -1e38  # mask sentinel (finite: avoids -inf - -inf NaNs in the online max)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _posatt_kernel(
    scale_ref,  # (H, 1) SMEM — per-head bandwidth scales (indexed by grid h)
    thr_ref,  # (TLo, 1) VMEM — per-row locality threshold on raw distances
    dist_ref,  # (TLo, TLi) VMEM
    u_ref,  # (TLi, D) VMEM
    out_ref,  # (TLo, D) VMEM
    m_ref,  # scratch (TLo, 1)
    l_ref,  # scratch (TLo, 1)
    acc_ref,  # scratch (TLo, D)
):
    j = pl.program_id(3)
    nj = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    d = dist_ref[:]
    s = scale_ref[pl.program_id(0), 0]
    # d < inf excludes padded columns: under global attention (thr=+inf)
    # they would be "kept", and a zero bandwidth scale makes -inf*0 = NaN
    logits = jnp.where(jnp.logical_and(d <= thr_ref[:], d < jnp.inf), -d * s, _NEG)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    p = jnp.exp(logits - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p, u_ref[0], preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new

    @pl.when(j == nj - 1)
    def _finalize():
        out_ref[0, 0] = acc_ref[:] / l_ref[:]


def _pick_tiles(L_out: int, L_in: int):
    TLo = min(_round_up(L_out, 8), 256)
    TLi = min(_round_up(L_in, 128), 512)
    return TLo, TLi


def _pad_rows(x, target, fill=0.0):
    pad = target - x.shape[0]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1), constant_values=fill)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _posatt_fixed_raw(dist, thr, scale, u, *, interpret=False):
    """(H, B, L_out, D) = streamed softmax(-scale_h * masked dist) @ u.

    dist: (L_out, L_in); thr: (L_out, 1); scale: (H, 1); u: (B, L_in, D).
    """
    H = scale.shape[0]
    B, L_in, D = u.shape
    L_out = dist.shape[0]
    TLo, TLi = _pick_tiles(L_out, L_in)
    Lo_p, Li_p = _round_up(L_out, TLo), _round_up(L_in, TLi)

    # pad: distance pad rows/cols get +inf distance (masked everywhere);
    # threshold pad rows get +inf so padded rows stay finite (softmax over
    # uniform sentinel; rows are dropped on slice-out).
    dist_p = jnp.pad(
        dist, ((0, Lo_p - L_out), (0, Li_p - L_in)), constant_values=jnp.inf
    )
    thr_p = _pad_rows(thr, Lo_p, fill=jnp.inf)
    u_p = jnp.pad(u, ((0, 0), (0, Li_p - L_in), (0, 0)))

    grid = (H, B, Lo_p // TLo, Li_p // TLi)
    out = pl.pallas_call(
        _posatt_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (H, 1) scale table
            pl.BlockSpec((TLo, 1), lambda h, b, i, j: (i, 0)),
            pl.BlockSpec((TLo, TLi), lambda h, b, i, j: (i, j)),
            pl.BlockSpec((1, TLi, D), lambda h, b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TLo, D), lambda h, b, i, j: (h, b, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((H, B, Lo_p, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TLo, 1), jnp.float32),
            pltpu.VMEM((TLo, 1), jnp.float32),
            pltpu.VMEM((TLo, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * H * B * Lo_p * Li_p * D + 5 * H * B * Lo_p * Li_p,
            # dist's index map ignores (h, b) but the block changes every
            # j step, so v1 genuinely re-fetches the tile H*B times —
            # that re-streaming is exactly why v2/v3 fold the batch/heads
            bytes_accessed=4
            * (H * B * Lo_p * Li_p + B * Li_p * D + H * B * Lo_p * D),
            transcendentals=H * B * Lo_p * Li_p,
        ),
        interpret=interpret,
    )(scale.reshape(H, 1), thr_p, dist_p, u_p)
    return out[:, :, :L_out, :]


def _posatt_kernel_v2(
    scale_ref,  # (H, 1) SMEM
    thr_ref,  # (TLo, 1)
    dist_ref,  # (TLo, TLi)
    u_ref,  # (TLi, TN) — values with batch folded into the N axis
    out_ref,  # (TLo, TN)
    m_ref,
    l_ref,
    acc_ref,  # (TLo, TN)
):
    """Batch-folded variant: values are (L_in, B*D) so one distance-tile
    fetch feeds a (TLo, TLi) x (TLi, TN) MXU matmul across the whole batch.
    Grid (H, N, I, J): the distance matrix is read H * ceil(B*D/TN) times
    instead of v1's H * B times — the decisive traffic term when dist is the
    big operand (ZSSR decode: 181 MB vs sub-MB values)."""
    j = pl.program_id(3)
    nj = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    d = dist_ref[:]
    s = scale_ref[pl.program_id(0), 0]
    # d < inf excludes padded columns: under global attention (thr=+inf)
    # they would be "kept", and a zero bandwidth scale makes -inf*0 = NaN
    logits = jnp.where(jnp.logical_and(d <= thr_ref[:], d < jnp.inf), -d * s, _NEG)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    p = jnp.exp(logits - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p, u_ref[:], preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new

    @pl.when(j == nj - 1)
    def _finalize():
        out_ref[0] = acc_ref[:] / l_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _posatt_fixed_raw_v2(dist, thr, scale, u, *, interpret=False):
    """(H, B, L_out, D) via the batch-folded kernel."""
    H = scale.shape[0]
    B, L_in, D = u.shape
    L_out = dist.shape[0]
    TLo, TLi = _pick_tiles(L_out, L_in)
    BD = B * D
    TN = min(_round_up(BD, 128), 512)
    Lo_p, Li_p = _round_up(L_out, TLo), _round_up(L_in, TLi)
    BD_p = _round_up(BD, TN)

    dist_p = jnp.pad(
        dist, ((0, Lo_p - L_out), (0, Li_p - L_in)), constant_values=jnp.inf
    )
    thr_p = _pad_rows(thr, Lo_p, fill=jnp.inf)
    u_folded = jnp.transpose(u, (1, 0, 2)).reshape(L_in, BD)
    u_p = jnp.pad(u_folded, ((0, Li_p - L_in), (0, BD_p - BD)))

    grid = (H, BD_p // TN, Lo_p // TLo, Li_p // TLi)
    out = pl.pallas_call(
        _posatt_kernel_v2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TLo, 1), lambda h, n, i, j: (i, 0)),
            pl.BlockSpec((TLo, TLi), lambda h, n, i, j: (i, j)),
            pl.BlockSpec((TLi, TN), lambda h, n, i, j: (j, n)),
        ],
        out_specs=pl.BlockSpec((1, TLo, TN), lambda h, n, i, j: (h, i, n)),
        out_shape=jax.ShapeDtypeStruct((H, Lo_p, BD_p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TLo, 1), jnp.float32),
            pltpu.VMEM((TLo, 1), jnp.float32),
            pltpu.VMEM((TLo, TN), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * H * Lo_p * Li_p * BD_p + 5 * H * Lo_p * Li_p,
            bytes_accessed=4
            * (
                H * (BD_p // TN) * Lo_p * Li_p
                + H * Li_p * BD_p
                + H * Lo_p * BD_p
            ),
            transcendentals=H * (BD_p // TN) * Lo_p * Li_p,
        ),
        interpret=interpret,
    )(scale.reshape(H, 1), thr_p, dist_p, u_p)
    out = out[:, :L_out, :BD].reshape(H, L_out, B, D)
    return jnp.transpose(out, (0, 2, 1, 3))  # (H, B, L_out, D)


def _make_posatt_kernel_v3(H: int):
    def kernel(scale_ref, thr_ref, dist_ref, u_ref, out_ref, m_ref, l_ref, acc_ref):
        """Head-folded batch-folded variant: ONE distance-tile fetch feeds
        all H heads' logits + MXU matmuls (H is a static trace-time unroll).
        Grid (N, I, J): the distance matrix is read ceil(BD/TN) times total
        — v2's dominant traffic term divided by H. Decisive where dist is
        the big operand (ZSSR decode: 173 MB dist vs sub-MB values, H=2)."""
        j = pl.program_id(2)
        nj = pl.num_programs(2)

        @pl.when(j == 0)
        def _init():
            m_ref[:] = jnp.full_like(m_ref, _NEG)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        d = dist_ref[:]
        keep = jnp.logical_and(d <= thr_ref[:], d < jnp.inf)
        u = u_ref[:]
        for h in range(H):
            s = scale_ref[h, 0]
            logits = jnp.where(keep, -d * s, _NEG)
            m_prev = m_ref[h]
            m_new = jnp.maximum(
                m_prev, jnp.max(logits, axis=-1, keepdims=True)
            )
            p = jnp.exp(logits - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[h] = l_ref[h] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_ref[h] = acc_ref[h] * alpha + jnp.dot(
                p, u, preferred_element_type=jnp.float32
            )
            m_ref[h] = m_new

        @pl.when(j == nj - 1)
        def _finalize():
            out_ref[:] = acc_ref[:] / l_ref[:]

    return kernel


def _pick_tiles_v3(L_out: int, L_in: int, H: int, BD: int):
    """VMEM-aware tile pick: acc/out blocks are (H, TLo, TN)."""
    TLo = min(_round_up(L_out, 8), 256)
    TLi = min(_round_up(L_in, 128), 512)
    TN = min(_round_up(BD, 128), 512)
    # keep 2*(H*TLo*TN) f32 (acc scratch + out block) under ~8 MB
    while H * TLo * TN * 4 * 2 > 8 * 1024 * 1024 and TN > 128:
        TN = max(128, _round_up(TN // 2, 128))  # keep lane alignment
    while H * TLo * TN * 4 * 2 > 8 * 1024 * 1024 and TLo > 8:
        TLo = max(8, _round_up(TLo // 2, 8))  # keep sublane alignment
    return TLo, TLi, TN


@functools.partial(jax.jit, static_argnames=("interpret",))
def _posatt_fixed_raw_v3(dist, thr, scale, u, *, interpret=False):
    """(H, B, L_out, D) via the head-folded batch-folded kernel."""
    H = scale.shape[0]
    B, L_in, D = u.shape
    L_out = dist.shape[0]
    BD = B * D
    TLo, TLi, TN = _pick_tiles_v3(L_out, L_in, H, BD)
    Lo_p, Li_p = _round_up(L_out, TLo), _round_up(L_in, TLi)
    BD_p = _round_up(BD, TN)

    dist_p = jnp.pad(
        dist, ((0, Lo_p - L_out), (0, Li_p - L_in)), constant_values=jnp.inf
    )
    thr_p = _pad_rows(thr, Lo_p, fill=jnp.inf)
    u_folded = jnp.transpose(u, (1, 0, 2)).reshape(L_in, BD)
    u_p = jnp.pad(u_folded, ((0, Li_p - L_in), (0, BD_p - BD)))

    grid = (BD_p // TN, Lo_p // TLo, Li_p // TLi)
    out = pl.pallas_call(
        _make_posatt_kernel_v3(H),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TLo, 1), lambda n, i, j: (i, 0)),
            pl.BlockSpec((TLo, TLi), lambda n, i, j: (i, j)),
            pl.BlockSpec((TLi, TN), lambda n, i, j: (j, n)),
        ],
        out_specs=pl.BlockSpec((H, TLo, TN), lambda n, i, j: (0, i, n)),
        out_shape=jax.ShapeDtypeStruct((H, Lo_p, BD_p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((H, TLo, 1), jnp.float32),
            pltpu.VMEM((H, TLo, 1), jnp.float32),
            pltpu.VMEM((H, TLo, TN), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * H * Lo_p * Li_p * BD_p + 5 * H * Lo_p * Li_p,
            bytes_accessed=4
            * ((BD_p // TN) * Lo_p * Li_p + Li_p * BD_p + H * Lo_p * BD_p),
            transcendentals=H * (BD_p // TN) * Lo_p * Li_p,
        ),
        interpret=interpret,
    )(scale.reshape(H, 1), thr_p, dist_p, u_p)
    out = out[:, :L_out, :BD].reshape(H, L_out, B, D)
    return jnp.transpose(out, (0, 2, 1, 3))  # (H, B, L_out, D)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _posatt_stats(dist, thr, scale, *, interpret=False):
    """Final softmax row statistics (M, L): m_i = max_j logits_ij and
    l_i = sum_j exp(logits_ij - m_i), per head. One streaming pass; used as
    residuals by the fused backward so attention never needs storing."""
    H = scale.shape[0]
    L_out, L_in = dist.shape
    TLo, TLi = _pick_tiles(L_out, L_in)
    Lo_p, Li_p = _round_up(L_out, TLo), _round_up(L_in, TLi)
    dist_p = jnp.pad(
        dist, ((0, Lo_p - L_out), (0, Li_p - L_in)), constant_values=jnp.inf
    )
    thr_p = _pad_rows(thr, Lo_p, fill=jnp.inf)

    def kernel(scale_ref, thr_ref, dist_ref, m_out, l_out, m_ref, l_ref):
        # head-folded like _make_posatt_kernel_v3: ONE distance-tile
        # fetch feeds all H heads (grid (I, J), static head unroll) —
        # the previous (H, I, J) grid re-streamed the full distance
        # matrix once per head, multiplying the fused-backward residual
        # pass's dominant HBM term by H
        j = pl.program_id(1)
        nj = pl.num_programs(1)

        @pl.when(j == 0)
        def _init():
            m_ref[:] = jnp.full_like(m_ref, _NEG)
            l_ref[:] = jnp.zeros_like(l_ref)

        d = dist_ref[:]
        keep = jnp.logical_and(d <= thr_ref[:], d < jnp.inf)
        for h in range(H):
            s = scale_ref[h, 0]
            logits = jnp.where(keep, -d * s, _NEG)
            m_prev = m_ref[h]
            m_new = jnp.maximum(
                m_prev, jnp.max(logits, axis=-1, keepdims=True)
            )
            l_ref[h] = l_ref[h] * jnp.exp(m_prev - m_new) + jnp.sum(
                jnp.exp(logits - m_new), axis=-1, keepdims=True
            )
            m_ref[h] = m_new

        @pl.when(j == nj - 1)
        def _fin():
            m_out[:] = m_ref[:]
            l_out[:] = l_ref[:]

    M, L = pl.pallas_call(
        kernel,
        grid=(Lo_p // TLo, Li_p // TLi),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TLo, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((TLo, TLi), lambda i, j: (i, j)),
        ],
        out_specs=(
            pl.BlockSpec((H, TLo, 1), lambda i, j: (0, i, 0)),
            pl.BlockSpec((H, TLo, 1), lambda i, j: (0, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((H, Lo_p, 1), jnp.float32),
            jax.ShapeDtypeStruct((H, Lo_p, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((H, TLo, 1), jnp.float32),
            pltpu.VMEM((H, TLo, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(scale.reshape(H, 1), thr_p, dist_p)
    return M[:, :L_out], L[:, :L_out]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _posatt_bwd_dscale(dist, thr, scale, M, L, gf, uf, *, interpret=False):
    """d(loss)/d(scale): (H, 1), without storing the attention matrix.

    With P = softmax rows and T = Gf @ Uf^T (the output-cotangent/value
    inner products), dL/dlogits = P * (T - r) with r_i = sum_j P_ij T_ij,
    and dlogits/ds = -d on kept entries. So per row
      r_i = sum_j P_ij T_ij,  w_i = sum_j P_ij T_ij (-d_ij),
      v_i = sum_j P_ij (-d_ij),   ds_h = sum_i (w_i - r_i v_i)
    — all j-sums, accumulated per row block across (j, n) tiles in one
    streaming pass using the forward's (M, L) softmax statistics."""
    H = scale.shape[0]
    L_out, L_in = dist.shape
    BD = gf.shape[-1]
    TLo, TLi = _pick_tiles(L_out, L_in)
    TN = min(_round_up(BD, 128), 512)
    # head-folded scratch is (H, TLo, TLi) + (H, TLo, TN): keep under ~6 MB
    while H * TLo * (TLi + TN) * 4 > 6 * 1024 * 1024 and TLi > 128:
        TLi = max(128, _round_up(TLi // 2, 128))  # keep lane alignment
    while H * TLo * (TLi + TN) * 4 > 6 * 1024 * 1024 and TLo > 8:
        TLo = max(8, _round_up(TLo // 2, 8))  # keep sublane alignment
    Lo_p, Li_p = _round_up(L_out, TLo), _round_up(L_in, TLi)
    BD_p = _round_up(BD, TN)
    dist_p = jnp.pad(
        dist, ((0, Lo_p - L_out), (0, Li_p - L_in)), constant_values=jnp.inf
    )
    thr_p = _pad_rows(thr, Lo_p, fill=jnp.inf)
    # padded rows: l=1, g=0 -> p finite, t zero -> no contribution
    M_p = jnp.pad(M, ((0, 0), (0, Lo_p - L_out), (0, 0)))
    L_p = jnp.pad(L, ((0, 0), (0, Lo_p - L_out), (0, 0)), constant_values=1.0)
    gf_p = jnp.pad(gf, ((0, 0), (0, Lo_p - L_out), (0, BD_p - BD)))
    uf_p = jnp.pad(uf, ((0, Li_p - L_in), (0, BD_p - BD)))

    def kernel(
        scale_ref, thr_ref, m_ref, l_ref, dist_ref, g_ref, u_ref,
        ds_out, t_acc, r_acc, v_acc, w_acc, ds_acc,
    ):
        # head-folded: one dist/u/g tile fetch serves all H heads (the
        # per-head loop is a static trace-time unroll)
        i, j, n = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        ni, nj, nn = (
            pl.num_programs(0), pl.num_programs(1), pl.num_programs(2),
        )
        first = jnp.logical_and(i == 0, jnp.logical_and(j == 0, n == 0))

        @pl.when(first)
        def _init_ds():
            for h in range(H):
                ds_acc[h, 0] = 0.0

        @pl.when(jnp.logical_and(j == 0, n == 0))
        def _init_rows():
            r_acc[:] = jnp.zeros_like(r_acc)
            v_acc[:] = jnp.zeros_like(v_acc)
            w_acc[:] = jnp.zeros_like(w_acc)

        @pl.when(n == 0)
        def _init_t():
            t_acc[:] = jnp.zeros_like(t_acc)

        ut = u_ref[:].T
        for h in range(H):
            t_acc[h] += jnp.dot(
                g_ref[h], ut, preferred_element_type=jnp.float32
            )

        @pl.when(n == nn - 1)
        def _reduce():
            d = dist_ref[:]
            # exclude padding (d = +inf): with a +inf threshold (global
            # attention) it would otherwise be "kept" and 0 * -inf = NaN
            keep = jnp.logical_and(d <= thr_ref[:], d < jnp.inf)
            nd = jnp.where(keep, -d, 0.0)
            for h in range(H):
                s = scale_ref[h, 0]
                p = (
                    jnp.where(keep, jnp.exp(-d * s - m_ref[h]), 0.0)
                    / l_ref[h]
                )
                t = t_acc[h]
                r_acc[h] += jnp.sum(p * t, axis=-1, keepdims=True)
                w_acc[h] += jnp.sum(p * t * nd, axis=-1, keepdims=True)
                v_acc[h] += jnp.sum(p * nd, axis=-1, keepdims=True)

        @pl.when(jnp.logical_and(j == nj - 1, n == nn - 1))
        def _fold_rows():
            for h in range(H):
                ds_acc[h, 0] += jnp.sum(w_acc[h] - r_acc[h] * v_acc[h])

        @pl.when(
            jnp.logical_and(
                i == ni - 1, jnp.logical_and(j == nj - 1, n == nn - 1)
            )
        )
        def _fin():
            for h in range(H):
                ds_out[h, 0] = ds_acc[h, 0]

    ds = pl.pallas_call(
        kernel,
        grid=(Lo_p // TLo, Li_p // TLi, BD_p // TN),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TLo, 1), lambda i, j, n: (i, 0)),
            pl.BlockSpec((H, TLo, 1), lambda i, j, n: (0, i, 0)),
            pl.BlockSpec((H, TLo, 1), lambda i, j, n: (0, i, 0)),
            pl.BlockSpec((TLo, TLi), lambda i, j, n: (i, j)),
            pl.BlockSpec((H, TLo, TN), lambda i, j, n: (0, i, n)),
            pl.BlockSpec((TLi, TN), lambda i, j, n: (j, n)),
        ],
        # full-array SMEM output indexed by head inside the kernel (TPU
        # lowering requires scalar-ish blocks to cover the whole array)
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((H, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((H, TLo, TLi), jnp.float32),
            pltpu.VMEM((H, TLo, 1), jnp.float32),
            pltpu.VMEM((H, TLo, 1), jnp.float32),
            pltpu.VMEM((H, TLo, 1), jnp.float32),
            pltpu.SMEM((H, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(scale.reshape(H, 1), thr_p, M_p, L_p, dist_p, gf_p, uf_p)
    return ds


@functools.partial(jax.jit, static_argnames=("interpret",))
def _posatt_bwd_du(dist, thr, scale, M, L, gf, *, interpret=False):
    """d(loss)/d(values), folded layout (L_in, B*D) = sum_h P_h^T @ Gf_h,
    streaming over L_out tiles with attention recomputed from (M, L)."""
    H = scale.shape[0]
    L_out, L_in = dist.shape
    BD = gf.shape[-1]
    TLo, TLi = _pick_tiles(L_out, L_in)
    TN = min(_round_up(BD, 128), 512)
    # the (H, TLo, TN) gradient block is unbounded in H: shrink tiles to
    # the same ~6 MB budget the dscale kernel enforces (latent at the
    # current H <= 2 configs, a Mosaic VMEM failure waiting at H = 8)
    while H * TLo * (TLi + TN) * 4 > 6 * 1024 * 1024 and TN > 128:
        TN = max(128, _round_up(TN // 2, 128))  # keep lane alignment
    while H * TLo * (TLi + TN) * 4 > 6 * 1024 * 1024 and TLo > 8:
        TLo = max(8, _round_up(TLo // 2, 8))  # keep sublane alignment
    Lo_p, Li_p = _round_up(L_out, TLo), _round_up(L_in, TLi)
    BD_p = _round_up(BD, TN)
    dist_p = jnp.pad(
        dist, ((0, Lo_p - L_out), (0, Li_p - L_in)), constant_values=jnp.inf
    )
    thr_p = _pad_rows(thr, Lo_p, fill=jnp.inf)
    M_p = jnp.pad(M, ((0, 0), (0, Lo_p - L_out), (0, 0)))
    L_p = jnp.pad(L, ((0, 0), (0, Lo_p - L_out), (0, 0)), constant_values=1.0)
    gf_p = jnp.pad(gf, ((0, 0), (0, Lo_p - L_out), (0, BD_p - BD)))

    def kernel(
        scale_ref, thr_ref, m_ref, l_ref, dist_ref, g_ref, du_out, du_acc
    ):
        # head-folded: the dist tile is read once per (j, n, i) and feeds
        # all H heads' P^T @ G accumulations (static unroll over h)
        i = pl.program_id(2)
        ni = pl.num_programs(2)

        @pl.when(i == 0)
        def _init():
            du_acc[:] = jnp.zeros_like(du_acc)

        d = dist_ref[:]
        keep = jnp.logical_and(d <= thr_ref[:], d < jnp.inf)
        for h in range(H):
            s = scale_ref[h, 0]
            p = jnp.where(keep, jnp.exp(-d * s - m_ref[h]), 0.0) / l_ref[h]
            du_acc[:] += jnp.dot(
                p.T, g_ref[h], preferred_element_type=jnp.float32
            )

        @pl.when(i == ni - 1)
        def _fin():
            du_out[:] = du_acc[:]

    du = pl.pallas_call(
        kernel,
        grid=(Li_p // TLi, BD_p // TN, Lo_p // TLo),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TLo, 1), lambda j, n, i: (i, 0)),
            pl.BlockSpec((H, TLo, 1), lambda j, n, i: (0, i, 0)),
            pl.BlockSpec((H, TLo, 1), lambda j, n, i: (0, i, 0)),
            pl.BlockSpec((TLo, TLi), lambda j, n, i: (i, j)),
            pl.BlockSpec((H, TLo, TN), lambda j, n, i: (0, i, n)),
        ],
        out_specs=pl.BlockSpec((TLi, TN), lambda j, n, i: (j, n)),
        out_shape=jax.ShapeDtypeStruct((Li_p, BD_p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TLi, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(scale.reshape(H, 1), thr_p, M_p, L_p, dist_p, gf_p)
    return du[:L_in, :BD]


def _reference_forward(dist, thr, scale, u):
    """XLA oracle/backward path (same contract as _posatt_fixed_raw)."""
    logits = jnp.where(dist <= thr, -dist[None] * scale[:, :, None], _NEG)
    att = jax.nn.softmax(logits, axis=-1)  # (H, Lo, Li)
    return jnp.einsum("hnj,bjd->hbnd", att, u)


def _run_raw(version, dist, thr, scale, u, interpret):
    if version == 3:
        return _posatt_fixed_raw_v3(dist, thr, scale, u, interpret=interpret)
    if version == 2:
        return _posatt_fixed_raw_v2(dist, thr, scale, u, interpret=interpret)
    if version == 1:
        return _posatt_fixed_raw(dist, thr, scale, u, interpret=interpret)
    raise ValueError(
        f"unknown kernel version {version!r}; expected 1, 2 or 3 "
        "(a typo'd version would silently benchmark the wrong kernel)"
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _posatt_fixed(
    dist, thr, scale, u, interpret=False, version=3, fused_bwd=True,
):
    return _run_raw(version, dist, thr, scale, u, interpret)


def _posatt_fixed_fwd(dist, thr, scale, u, interpret, version, fused_bwd):
    out = _run_raw(version, dist, thr, scale, u, interpret)
    if fused_bwd:
        M, L = _posatt_stats(dist, thr, scale, interpret=interpret)
        return out, (dist, thr, scale, u, M, L)
    return out, (dist, thr, scale, u, None, None)


def _posatt_fixed_bwd(interpret, version, fused_bwd, residuals, g):
    dist, thr, scale, u, M, L = residuals
    if not fused_bwd:
        # fall back: recompute attention in XLA (materializes (H, Lo, Li))
        def f(scale, u):
            return _reference_forward(dist, thr, scale, u)

        _, vjp = jax.vjp(f, scale, u)
        dscale, du = vjp(g)
        return None, None, dscale, du

    H = scale.shape[0]
    B, L_in, D = u.shape
    L_out = dist.shape[0]
    # fold batch into the matmul N axis (same layout as the v2 forward)
    gf = jnp.transpose(g, (0, 2, 1, 3)).reshape(H, L_out, B * D)
    uf = jnp.transpose(u, (1, 0, 2)).reshape(L_in, B * D)
    dscale = _posatt_bwd_dscale(
        dist, thr, scale, M, L, gf, uf, interpret=interpret
    )
    duf = _posatt_bwd_du(dist, thr, scale, M, L, gf, interpret=interpret)
    du = jnp.transpose(duf.reshape(L_in, B, D), (1, 0, 2))
    return None, None, dscale, du


_posatt_fixed.defvjp(_posatt_fixed_fwd, _posatt_fixed_bwd)


def position_attention_fixed(
    dist: jnp.ndarray,
    lmda: jnp.ndarray,
    inputs: jnp.ndarray,
    locality: float,
    thr: jnp.ndarray | None = None,
    *,
    interpret: bool = False,
    version: int = 3,
    fused_bwd: bool = True,
) -> jnp.ndarray:
    """Drop-in fused equivalent of ``ops.posatt.position_attention`` for
    fixed meshes: returns (B, L_out, H*D).

    ``thr``: optional precomputed per-row quantile threshold (L_out, 1); it
    is computed on the fly (XLA sort) when absent and ``locality < 1``.
    ``version``: 3 = head-folded + batch-folded (one distance pass total),
    2 = batch-folded values (distance read once per head), 1 =
    per-(head, batch) grid.

    A bf16-MXU "option" was removed after measurement (round 3): default-
    precision f32 ``jnp.dot`` already lowers to a single bf16 MXU pass with
    f32 accumulation on v5e, so explicit bf16 casts produced bit-identical
    outputs and no end-to-end speedup (BASELINE.md).
    """
    H = lmda.shape[0]
    B = inputs.shape[0]
    L_out = dist.shape[0]
    if locality >= 1.0:
        thr = jnp.full((L_out, 1), jnp.inf, jnp.float32)
    elif thr is None:
        thr = quantile_threshold(dist, locality)
    scale = bandwidth_scale(lmda).reshape(H, 1)
    out = _posatt_fixed(
        dist, thr, scale, inputs, interpret, version, fused_bwd
    )
    out = jnp.transpose(out, (1, 2, 0, 3))  # (B, Lo, H, D)
    return out.reshape(B, L_out, H * inputs.shape[-1])
