"""Tie-robust locality thresholds (round-5, VERDICT item 5).

On tie-heavy regular grids (NACA C-grid: 53% of decoder rows have their
kc-th and (kc+1)-th smallest distances exactly tied) a plain order-statistic
threshold makes the kept set ``d <= thr`` flip with last-ulp codegen
differences between the computation that produced ``thr`` and a kernel's
in-VMEM distance recomputation (scripts/debug_band_parity.py). The robust
wide-gap threshold (ops/locality.robust_topk_threshold) must make kept sets
invariant to sub-margin perturbations — including on exactly-tied rows —
while reproducing the quantile-equivalent kept set on tie-safe rows.
"""

import jax.numpy as jnp
import numpy as np

from position_induced_transformer_tpu.ops.distances import euclidean_sq
from position_induced_transformer_tpu.ops.locality import (
    batched_topk_thresholds,
    midpoint_to_next,
    robust_topk_threshold,
    topk_keep_count,
    topk_threshold,
)


def _regular_grid(n=16):
    """(n*n, 2) regular grid — maximally tie-heavy distance spectrum."""
    xs = np.linspace(0.0, 1.0, n)
    g = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
    return jnp.asarray(g, jnp.float32)


def test_robust_threshold_never_splits_tie_groups():
    # locality chosen so the nominal cut c lands INSIDE the 4-way tie group
    # of nearest axis neighbours (regular grid spectrum: 0, h^2 x4, 2h^2 x4,
    # ...): c = 4 for 256 points at locality 3/255 (cut after 4 of the 5
    # entries <= h^2 — mid-tie-group).
    m = _regular_grid(16)
    dist = euclidean_sq(m, m)
    loc = 3.0 / 255.0
    assert topk_keep_count(dist.shape[-1], loc) == 4
    thr = robust_topk_threshold(dist, loc)
    d = np.asarray(dist, np.float64)
    t = np.asarray(thr, np.float64)
    keep = d <= t
    # no tie group is split: a kept and an unkept entry never share a value
    for row in range(0, d.shape[0], 17):
        kept_vals = set(d[row][keep[row]].tolist())
        unkept_vals = set(d[row][~keep[row]].tolist())
        assert not (kept_vals & unkept_vals)
    # the cut stays within `window` of the nominal count
    counts = keep.sum(-1)
    assert counts.min() >= 1 and counts.max() <= 4 + 4 + 4  # c + window + tie run


def test_robust_mask_invariant_under_ulp_perturbation():
    m = _regular_grid(16)
    dist = euclidean_sq(m, m)
    for loc in (3.0 / 255.0, 0.05, 0.2):
        thr = np.asarray(robust_topk_threshold(dist, loc), np.float64)
        d = np.asarray(dist, np.float64)
        keep = d <= thr
        rng = np.random.default_rng(0)
        for _ in range(3):
            # simulate cross-codegen fma/rounding noise: few-ulp RELATIVE
            # jitter (both distance computations are diff-square-sum)
            noise = 1.0 + 3e-7 * rng.choice([-1.0, 1.0], size=d.shape)
            assert ((d * noise <= thr) == keep).all(), loc


def test_robust_live_vs_setup_masks_identical():
    # live (f32 jnp) vs setup (f64 numpy) distance computations must
    # produce the SAME kept set when masked by the same robust threshold
    m = _regular_grid(16)
    dist32 = euclidean_sq(m, m)
    thr = np.asarray(robust_topk_threshold(dist32, 0.02), np.float64)
    m64 = np.asarray(m, np.float64)
    dist64 = ((m64[:, None, :] - m64[None, :, :]) ** 2).sum(-1)
    keep32 = np.asarray(dist32, np.float64) <= thr
    keep64 = dist64 <= thr
    assert (keep32 == keep64).all()


def test_robust_equals_plain_midpoint_on_tie_safe_rows():
    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.standard_normal((200, 2)), jnp.float32)
    dist = euclidean_sq(pts, pts)
    for loc in (0.02, 0.1):
        r = robust_topk_threshold(dist, loc)
        p = midpoint_to_next(dist, topk_threshold(dist, loc))
        keep_r = dist <= r
        keep_p = dist <= p
        assert (np.asarray(keep_r) == np.asarray(keep_p)).all()
        assert (
            np.asarray(keep_r).sum(-1)
            == topk_keep_count(dist.shape[-1], loc)
        ).all()


def test_batched_setup_thresholds_robust_on_tied_grid():
    # the batched setup path (what elasticity/NACA production uses) gets
    # the same invariance on a tie-heavy grid
    g = _regular_grid(12)
    mq = jnp.stack([g, g + 0.5])  # (B, L, 2)
    thr = batched_topk_thresholds(mq, mq, 0.02)
    d = np.asarray(euclidean_sq(mq, mq), np.float64)
    t = np.asarray(thr, np.float64)
    keep = d <= t
    rng = np.random.default_rng(1)
    noise = 1.0 + 3e-7 * rng.choice([-1.0, 1.0], size=d.shape)
    assert ((d * noise <= t) == keep).all()
