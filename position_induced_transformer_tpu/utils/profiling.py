"""Tracing, profiling and numerics-debug utilities.

The reference's only observability is a wall-clock print per epoch
(reference: train_burgers.py:84,113-114). Here (SURVEY.md §5):

- ``trace``: context manager around ``jax.profiler`` emitting a TensorBoard
  trace directory (op-level TPU timeline, HBM usage).
- ``StepTimer``: cheap wall-clock stats (mean/p50/p95) for steady-state
  steps, excluding compile.
- ``flops_estimate``: analytic FLOP count for a PiT forward, used to report
  achieved FLOP/s against the chip peak.
- ``debug_nans``: toggle for ``jax_debug_nans`` (the single-controller
  equivalent of a race/sanitizer mode — SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def debug_nans(enable: bool = True) -> None:
    """Abort with a traceback on the first NaN produced under jit."""
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Wall-clock step statistics excluding warmup/compile steps."""

    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self.samples: List[float] = []
        self._seen = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.skip_first:
            self.samples.append(dt)
        return False

    def stats(self) -> dict:
        if not self.samples:
            return {"n": 0}
        s = sorted(self.samples)
        n = len(s)
        return {
            "n": n,
            "mean_s": sum(s) / n,
            "p50_s": s[n // 2],
            "p95_s": s[min(n - 1, int(0.95 * n))],
            "min_s": s[0],
        }


def posatt_flops(L_out: int, L_in: int, n_head: int, d: int, batch: int) -> int:
    """FLOPs of one position-attention op: distance matrix + softmax
    (~7 flops/entry) + value contraction (2*B*H*Lo*Li*D)."""
    per_entry = 7 * n_head * L_out * L_in
    contraction = 2 * batch * n_head * L_out * L_in * d
    return per_entry + contraction


def pit_forward_flops(
    L_in: int,
    L_ltt: int,
    L_out: int,
    hid: int,
    n_head: int,
    n_blocks: int,
    in_dim: int,
    out_dim: int,
    batch: int,
) -> int:
    """Analytic forward-FLOP estimate for a PiT (encoder + processor +
    decoder, attention + MLPs)."""
    H = n_head
    f = posatt_flops(L_ltt, L_in, H, in_dim, batch)  # down
    f += 2 * batch * L_ltt * (H * in_dim * hid + hid * hid)  # en_layer
    for _ in range(n_blocks):
        f += posatt_flops(L_ltt, L_ltt, H, hid, batch)
        f += 2 * batch * L_ltt * ((1 + H) * hid * hid + hid * hid)
    f += posatt_flops(L_out, L_ltt, H, hid, batch)  # up
    f += 2 * batch * L_out * (H * hid * hid + hid * out_dim)  # de
    return f
