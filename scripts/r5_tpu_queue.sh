#!/bin/bash
# Round-5 TPU run queue (VERDICT r4 items 2,4,5,6,7 + surrogate refresh).
# Run when the relay is healthy:   bash scripts/r5_tpu_queue.sh
# Steps ordered timing-sensitive first; each step bounded by timeout so a
# relay relapse can't wedge the queue. Logs: /tmp/r5_queue_<step>.log
set -u
cd "$(dirname "$0")/.."
step() {
  name="$1"; tmo="$2"; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r5_queue.log
  timeout "$tmo" "$@" > "/tmp/r5_queue_$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/r5_queue.log
}

# 0. sanity: one driver-bench capture on the healthy window
step bench       1200 python bench.py
# 1. same-session epoch sweep, all benchmarks (replaces BASELINE.md table)
step sweep       7200 python scripts/tpu_epoch_sweep.py
# 2. on-chip band-vs-thr parity with the tie-robust thresholds
step bandparity  2400 python scripts/debug_band_parity.py --tpu
# 3. kernel rooflines incl. the deferred-norm TF coordinate kernel A/B
step checks      3600 python scripts/tpu_checks.py "elasticity_tf coords" "elasticity_tf floor" "elasticity band" "naca decoder band" "elasticity_tf attention"
# 4. darcy gap arms (budget/capacity/architecture attribution)
step darcygap    7200 python scripts/tpu_darcy_gap.py
# 5. full-budget refresh on the r5 operator-learning surrogates (+shuffle)
step fullbudget  10800 python scripts/tpu_full_budget.py naca elasticity cylinder naca_tf elasticity_tf
# 6. bf16 arms of the affected benchmarks
step fullbf16    9000 python scripts/tpu_full_budget.py cylinder:bf16 naca_tf:bf16 elasticity_tf:bf16
# 7. vorticity_tf published-config seed ensemble (+warmup rescue arm)
step ensemble    10800 python scripts/tpu_vorticity_tf_ensemble.py 5 120
echo "QUEUE DONE $(date -u)" | tee -a /tmp/r5_queue.log
