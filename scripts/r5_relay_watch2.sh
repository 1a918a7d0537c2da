#!/bin/bash
# Poll the TPU relay; when device discovery + one op succeed within the
# bound, launch round-5 queue part 2 exactly once (lock-file guarded).
set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/r5_queue2_started
PROBE='
import jax, jax.numpy as jnp
d = jax.devices()
assert d[0].platform != "cpu", d
print("PROBE_OK", float(jnp.ones((8,8)).sum()))
'
while true; do
  if [ -e "$LOCK" ]; then echo "queue2 already started; watcher exiting"; exit 0; fi
  out=$(timeout 90 python -c "$PROBE" 2>&1)
  if echo "$out" | grep -q PROBE_OK; then
    echo "$(date -u) relay healthy: $out" | tee -a /tmp/r5_watch2.log
    while [ -e /tmp/r5_cpu_busy ]; do
      echo "$(date -u) waiting for CPU job to finish" >> /tmp/r5_watch2.log
      sleep 60
    done
    # atomic lock (mkdir): two watchers that both reach this point can
    # not both start the queue (check-then-touch was a TOCTOU hole across
    # the unbounded CPU-busy wait above)
    if ! mkdir "$LOCK.d" 2>/dev/null; then
      echo "another watcher took the lock; exiting" | tee -a ${LOG:-/dev/null}
      exit 0
    fi
    touch "$LOCK"
    bash scripts/r5_tpu_queue2.sh
    exit 0
  fi
  echo "$(date -u) relay still down (probe: ${out:0:120})" >> /tmp/r5_watch2.log
  sleep 300
done
