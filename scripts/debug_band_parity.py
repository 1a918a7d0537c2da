"""Diagnosis of the naca-band ~5e-4 band-vs-thr parity reading (and why
earlier sessions measured 1.2e-7 for the same comparison).

Findings (2026-08-19, recorded in BASELINE.md's band-skip paragraph):

1. NOT underflow/dead rows: on the real synthetic NACA C-grid geometry
   s * dmin is ~0 for every decoder row (the latent cloud is a strided
   slice of the same grid, so the nearest kept column is essentially
   coincident) — the former no-max kernel never underflowed here, and
   the kept-min softmax shift does not change this geometry's outputs
   beyond fp noise. (The shift matters for ARBITRARY learned
   bandwidths — tests/test_pallas.py
   test_batched_extreme_bandwidth_no_dead_rows.)

2. EXACT-TIE SENSITIVITY is the mechanism: 53% of decoder rows have
   their kc-th and (kc+1)-th smallest distances EXACTLY equal (min rel
   gap 0 — the C-grid is tie-heavy, CLAUDE.md known fragility). The
   kept set is decided by ``dist <= thr`` with thr an order statistic
   of the row, so ANY last-ulp codegen difference between the two
   kernel shapes (768-wide thr tile vs 256-wide band slice: Mosaic may
   fuse square-add into fma differently per shape, and that choice can
   shift with unrelated kernel-body edits) flips tie columns in or
   out. A flipped column carries softmax weight <= ~1/keep_count =
   4.4e-3, bounding the reading; measured values bounce between 1.2e-7
   (bitwise-agreeing codegen) and ~5e-4 across kernel revisions.

3. Interpret mode (shared CPU codegen for both impls) agrees to 3e-7,
   confirming the chip reading is codegen-induced tie flipping, not a
   band-coverage bug (ops/locality.batched_band_starts coverage is
   exact by construction from the same mask).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import numpy as np
import jax

# --tpu: run the kernel A/B on the default (TPU) backend with the real
# Mosaic codegen — the round-5 robust wide-gap thresholds
# (ops/locality.robust_topk_threshold) must hold band-vs-thr parity at
# ~1e-7 HERE, where the two kernel shapes' fma contraction can differ
# (the pre-r5 reading floated to 4.6e-4 on exactly-tied rows).
ON_TPU = "--tpu" in sys.argv
if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp

from position_induced_transformer_tpu.data import loaders
from position_induced_transformer_tpu.kernels import (
    BandSpec,
    band_tile_rows,
    position_attention_batched,
)
from position_induced_transformer_tpu.ops.locality import (
    batched_band_starts,
    batched_topk_thresholds,
    topk_keep_count,
)
from position_induced_transformer_tpu.ops.posatt import bandwidth_scale

B, H, D, loc = 2, 1, 128, 0.02
_, X_tr, _, _, _, _ = loaders.naca(None, 20, 2, nx=221, ny=51)
X = jnp.asarray(X_tr[:B])
mk = X[:, ::4, ::4, :][:, :56, :13, :].reshape(B, -1, 2)
mq = X.reshape(B, -1, 2)
Lq, Lk = mq.shape[1], mk.shape[1]
thr = batched_topk_thresholds(mq, mk, loc, chunk=4)
band = batched_band_starts(mq, mk, thr, band_tile_rows(Lq), chunk=4)
assert band is not None
spec = BandSpec(*band)
print(f"Lq={Lq} Lk={Lk} band_width={spec.width}")

lmda0 = jnp.asarray(
    np.random.default_rng(1).standard_normal((H, 1, 1)), jnp.float32
)
s = float(bandwidth_scale(lmda0)[0, 0, 0])
print(f"lmda={float(lmda0[0,0,0]):.4f} scale s={s:.4f}")

# --- claim 1: dmin distribution / dead rows under the no-shift kernel
mqn = np.asarray(mq, np.float64)
mkn = np.asarray(mk, np.float64)
dist = ((mqn[:, :, None, :] - mkn[:, None, :, :]) ** 2).sum(-1)  # (B,Lq,Lk)
dmin = dist.min(-1)
sdmin = s * dmin
print(
    "s*dmin percentiles [50, 90, 99, 100]:",
    np.percentile(sdmin, [50, 90, 99, 100]).round(1),
)
dead = sdmin > 87.0  # exp(-x) flushes to 0 below ~exp(-87.3) in f32
frac = dead.mean()
print(f"rows with ALL numerators underflowed (no-shift kernel): "
      f"{dead.sum()} / {dead.size} = {100*frac:.2f}%")

# --- claim 2: tie margin at the threshold
thrn = np.asarray(thr, np.float64)[..., 0]  # (B, Lq)
kc = topk_keep_count(Lk, loc)
gap_rows = 0
min_rel_gap = np.inf
for b in range(B):
    srt = np.sort(dist[b], axis=-1)
    at = srt[:, kc - 1]  # == thr (exact order statistic)
    nxt = srt[:, kc]
    rel = (nxt - at) / np.maximum(at, 1e-30)
    min_rel_gap = min(min_rel_gap, float(rel.min()))
    gap_rows += int((rel < 1e-6).sum())  # within ~8 f32 ulps
print(f"rows with next-distance within 1e-6 rel of thr (tie-fragile): "
      f"{gap_rows} / {B*Lq}; min rel gap = {min_rel_gap:.3e}")

# --- claim 2b (round 5): the ROBUST threshold's actual safety margin —
# the closest any distance comes to thr, relative. The wide-gap
# construction targets >= ~5e-6 (half of rel_gap=1e-5); a kernel's
# in-VMEM recomputation differs by a few f32 ulps (~1e-7), so kept sets
# cannot flip wherever this margin holds.
margin = np.inf
for b in range(B):
    rel = np.abs(dist[b] - thrn[b][:, None]) / np.maximum(
        thrn[b][:, None], 1e-30
    )
    margin = min(margin, float(rel.min()))
print(f"robust-threshold min relative margin to any distance: {margin:.3e}")

# --- kernel A/B: interpret mode on CPU (shared codegen both sides), the
# real Mosaic kernels on TPU (--tpu; different codegen per kernel shape —
# the comparison the robust thresholds must win)
interp = not ON_TPU
u0 = jnp.asarray(np.random.default_rng(2).random((B, Lk, D)), jnp.float32)
out_thr = position_attention_batched(
    mq, mk, lmda0, u0, loc, thr, interpret=interp
)
out_band = position_attention_batched(
    mq, mk, lmda0, u0, loc, thr, spec, interpret=interp
)
d = np.abs(np.asarray(out_band) - np.asarray(out_thr))
mode = "on-chip" if ON_TPU else "interpret-mode"
print(f"{mode} band-vs-thr max abs err = {d.max():.3e} "
      f"(rows > 1e-5: {(d.max(-1) > 1e-5).sum()})")
