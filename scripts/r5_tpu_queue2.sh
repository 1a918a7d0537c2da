#!/bin/bash
# Round-5 TPU queue, part 2: the steps the 08-20 relay relapse cut off
# (queue 1 completed bench/sweep/bandparity/checks/darcygap and the
# naca/elasticity/cylinder f32 full budgets before dying mid-step-5).
# Run when the relay is healthy:   bash scripts/r5_tpu_queue2.sh
set -u
cd "$(dirname "$0")/.."
step() {
  name="$1"; tmo="$2"; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r5_queue2.log
  timeout "$tmo" "$@" > "/tmp/r5_queue2_$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/r5_queue2.log
}

# 1. finish the f32 full-budget refresh on the r5 TF-family surrogates
step fullbudget 10800 python scripts/tpu_full_budget.py naca_tf elasticity_tf
# 2. vorticity_tf published-config seed ensemble (+ warmup rescue arm)
step ensemble   12000 python scripts/tpu_vorticity_tf_ensemble.py 5 120
# 3. bf16 arms of every benchmark whose surrogate changed in r5
step fullbf16   12000 python scripts/tpu_full_budget.py naca:bf16 elasticity:bf16 cylinder:bf16 naca_tf:bf16 elasticity_tf:bf16
# 4. darcy capacity-ceiling arm (does hid256 beat hid128's 13.9%?)
step darcyhid256 3600 python scripts/tpu_darcy_gap.py hid256 epochs500_hid256
echo "QUEUE2 DONE $(date -u)" | tee -a /tmp/r5_queue2.log
