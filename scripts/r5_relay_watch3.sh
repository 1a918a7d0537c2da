#!/bin/bash
# Round-5 final watcher (08-21): poll the TPU relay; when device discovery
# + one op succeed within the bound, launch queue3 exactly once. Queue2's
# results are already committed, so this watcher gates on relay health only
# (the old queue3_watch waited on /tmp/r5_queue2.log, wiped by the VM
# restart).
set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/r5_queue3_started
PROBE='
import jax, jax.numpy as jnp
d = jax.devices()
assert d[0].platform != "cpu", d
print("PROBE_OK", float(jnp.ones((8,8)).sum()))
'
while true; do
  if [ -e "$LOCK" ]; then echo "queue3 already started; watcher exiting"; exit 0; fi
  out=$(timeout 90 python -c "$PROBE" 2>&1)
  if echo "$out" | grep -q PROBE_OK; then
    echo "$(date -u) relay healthy: $out" | tee -a /tmp/r5_watch3.log
    while [ -e /tmp/r5_cpu_busy ]; do
      echo "$(date -u) waiting for CPU job to finish" >> /tmp/r5_watch3.log
      sleep 60
    done
    if ! mkdir "$LOCK.d" 2>/dev/null; then
      echo "another watcher took the lock; exiting"
      exit 0
    fi
    touch "$LOCK"
    bash scripts/r5_tpu_queue3.sh
    exit 0
  fi
  echo "$(date -u) relay still down (probe: ${out:0:120})" >> /tmp/r5_watch3.log
  sleep 180
done
