#!/bin/bash
# Round-5 TPU queue, part 3: refreshes required by the 08-20 self-review
# fixes and the ensemble finding (seed 0 at the published vorticity_tf
# config CONVERGES on the r5 tie-robust masks — the collapsed FULL_BUDGET
# row was measured on r4 code). Runs after queue2 (r5_queue3_watch.sh).
set -u
cd "$(dirname "$0")/.."
step() {
  name="$1"; tmo="$2"; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r5_queue3.log
  timeout "$tmo" "$@" > "/tmp/r5_queue3_$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/r5_queue3.log
}

# 1. vorticity_tf 500-epoch full budget on current (tie-robust) code: the
#    committed row collapsed on r4 masks; the r5 ensemble shows seed 0
#    converging at the same published config
step vorttf     7200 python scripts/tpu_full_budget.py vorticity_tf
# 2. elasticity family f32 budgets on the clamped void generator (the
#    earlier rows were measured pre-clamp; bf16 arms in queue2 run
#    post-clamp, so these restore f32/bf16 data consistency)
step elasticity 7200 python scripts/tpu_full_budget.py elasticity elasticity_tf
# 3. cylinder re-run: shuffle row with the cross-trajectory pairing
step cylinder   7200 python scripts/tpu_full_budget.py cylinder
# 4. TF-kernel floor probes at the mandated n_iter=128
step floor      3600 python scripts/tpu_checks.py "elasticity_tf coords" "elasticity_tf floor"
echo "QUEUE3 DONE $(date -u)" | tee -a /tmp/r5_queue3.log
