#!/bin/bash
# Launch queue3 once queue2 has finished and the relay answers a probe.
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
  if grep -q "QUEUE2 DONE" /tmp/r5_queue2.log 2>/dev/null; then
    out=$(timeout 90 python -c "$PROBE" 2>&1)
    if echo "$out" | grep -q PROBE_OK; then
      while [ -e /tmp/r5_cpu_busy ]; do sleep 60; done
      if ! mkdir "$LOCK.d" 2>/dev/null; then exit 0; fi
      touch "$LOCK"
      bash scripts/r5_tpu_queue3.sh
      exit 0
    fi
  fi
  sleep 120
done
