"""Same-session A/B: serving startup with host-side setup vs device setup.

Measures `evaluate.Predictor` construction time on the default (TPU)
backend for a burgers checkpoint, with the round-3 host-setup path
(benchmarks.host_setup_context + commit_problem, the default) against the
pre-fix behavior (PIT_SETUP_HOST=never -> every eager setup op dispatches
through the relay). Construction runs in a SUBPROCESS per arm so each arm
pays its own backend init and nothing is warm-process-cached; arms
alternate A/B/A/B to cancel relay-load drift (CLAUDE.md: absolute numbers
from different hours are not comparable — only same-session A/B).

Writes SERVE_STARTUP_AB.json. Run on the TPU backend (no --platform).
"""

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time, os
t0 = time.time()
import jax
if os.environ.get("AB_PLATFORM"):  # smoke-testing the harness on CPU
    jax.config.update("jax_platforms", os.environ["AB_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", sys.argv[3])
sys.path.insert(0, sys.argv[1])
from position_induced_transformer_tpu.train import evaluate
t1 = time.time()
p = evaluate.Predictor("burgers", sys.argv[2])
t2 = time.time()
print(f"IMPORT {t1-t0:.2f} CONSTRUCT {t2-t1:.2f}", flush=True)
"""


def run_arm(ckpt: str, host_setup: bool) -> float:
    env = dict(os.environ)
    if not host_setup:
        env["PIT_SETUP_HOST"] = "never"
    else:
        env.pop("PIT_SETUP_HOST", None)
    cache = os.path.join(REPO, ".jax_cache")
    r = subprocess.run(
        [sys.executable, "-c", CHILD, REPO, ckpt, cache],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    line = [l for l in r.stdout.splitlines() if l.startswith("IMPORT")][-1]
    return float(line.split("CONSTRUCT")[1])


def main():
    import jax

    if os.environ.get("AB_PLATFORM"):
        # smoke mode: pin the PARENT too — its checkpoint-training run
        # would otherwise hit the default (axon) backend and hang when
        # the relay is down (the condition smoke mode exists for)
        jax.config.update("jax_platforms", os.environ["AB_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    sys.path.insert(0, REPO)
    from position_induced_transformer_tpu import configs
    from position_induced_transformer_tpu.train import runner

    td = tempfile.mkdtemp()
    ckpt = os.path.join(td, "ckpt")
    print("training 2-epoch burgers checkpoint (full config)...", flush=True)
    runner.train(
        "burgers", epochs=2, ntrain=32, ntest=8, verbose=False,
        checkpoint_path=ckpt,
    )

    reps = int(os.environ.get("AB_REPS", "3"))
    host, dev = [], []
    for i in range(reps):
        h = run_arm(ckpt, host_setup=True)
        print(f"  host-setup construct: {h:.2f}s", flush=True)
        host.append(h)
        d = run_arm(ckpt, host_setup=False)
        print(f"  device-setup construct: {d:.2f}s", flush=True)
        dev.append(d)

    out = {
        "ts": time.time(),
        # which backend the arms actually ran on: the real measurement is
        # the default (TPU relay); 'cpu' marks a harness smoke test where
        # both arms are expected ~equal (no relay round-trips to avoid)
        "platform": os.environ.get("AB_PLATFORM") or "default(tpu)",
        "reps": reps,
        "host_setup_s": host,
        "device_setup_s": dev,
        "host_median_s": statistics.median(host),
        "device_median_s": statistics.median(dev),
        "speedup": statistics.median(dev) / statistics.median(host),
    }
    path = os.path.join(REPO, "SERVE_STARTUP_AB.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
