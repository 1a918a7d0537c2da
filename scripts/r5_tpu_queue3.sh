#!/bin/bash
# Round-5 TPU queue, part 3: refreshes required by the 08-20 self-review
# fixes (elasticity void-profile clamp; cross-trajectory shuffle pairing;
# floor probes at n_iter=128). Runs after queue2 (r5_queue3_watch.sh).
set -u
cd "$(dirname "$0")/.."
step() {
  name="$1"; tmo="$2"; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r5_queue3.log
  timeout "$tmo" "$@" > "/tmp/r5_queue3_$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/r5_queue3.log
}

# 1. elasticity family f32 budgets on the clamped void generator (the
#    queue2 rows were measured pre-clamp; bf16 arms in queue2 run
#    post-clamp, so these restore f32/bf16 data consistency)
step elasticity 7200 python scripts/tpu_full_budget.py elasticity elasticity_tf
# 2. cylinder re-run: shuffle row with the cross-trajectory pairing
step cylinder   7200 python scripts/tpu_full_budget.py cylinder
# 3. TF-kernel floor probes at the mandated n_iter=128
step floor      3600 python scripts/tpu_checks.py "elasticity_tf coords" "elasticity_tf floor"
echo "QUEUE3 DONE $(date -u)" | tee -a /tmp/r5_queue3.log
