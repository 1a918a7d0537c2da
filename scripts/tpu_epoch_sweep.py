"""Per-benchmark training throughput sweep on the attached TPU chip.

Runs every benchmark at its REAL model configuration (synthetic data,
reduced ntrain so the sweep stays tractable) for a few epochs and reports
steady-state seconds/epoch extrapolated to the reference's full ntrain —
the number comparable to the reference's printed s/epoch
(reference: train_burgers.py:113-114).

Writes BENCH_SWEEP.json and prints one JSON line per benchmark.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

from position_induced_transformer_tpu import configs
from position_induced_transformer_tpu.train import runner

# per-benchmark reduced sample counts (shapes/model stay full-size)
SWEEP = {
    "burgers": dict(ntrain=256, ntest=32),
    "sod": dict(ntrain=256, ntest=32),
    "darcy": dict(ntrain=256, ntest=20),
    "vorticity": dict(ntrain=100, ntest=20),  # >=5 steps/epoch so eval+sync overhead does not dominate
    "elasticity": dict(ntrain=100, ntest=20),
    "naca": dict(ntrain=100, ntest=20),
    "cylinder": dict(ntrain=1000, ntest=100),
    # TF-family (original paper) experiments at their full configurations
    "burgers_tf": dict(ntrain=100, ntest=20),
    "sod_tf": dict(ntrain=128, ntest=16),
    "darcy_tf": dict(ntrain=128, ntest=16),
    "vorticity_tf": dict(ntrain=80, ntest=16),
    "elasticity_tf": dict(ntrain=100, ntest=20),
    "naca_tf": dict(ntrain=128, ntest=16),
}


def main(names=None):
    results = {}
    for name, kw in SWEEP.items():
        if names and name not in names:
            continue
        cfg = configs.get(name)
        epochs = 3
        t0 = time.time()
        try:
            problem, state, history = runner.train(
                cfg, epochs=epochs, verbose=False, **kw
            )
            # pipelined steady state: epochs dispatched back-to-back with a
            # single device->host sync at the end (each per-epoch scalar
            # readback stalls ~0.1 s through the TPU tunnel, which dominates
            # the fast benchmarks) — the production configuration (runner
            # sync_every=0). Two-run difference cancels trace/compile.
            n_pipe = 6
            t1 = time.time()
            runner.train(cfg, epochs=1, verbose=False, sync_every=0, **kw)
            wall_one = time.time() - t1
            t1 = time.time()
            runner.train(
                cfg, epochs=1 + n_pipe, verbose=False, sync_every=0, **kw
            )
            pipe_steady = max(
                (time.time() - t1 - wall_one) / n_pipe, 1e-9
            )
        except Exception as e:  # record and continue the sweep
            results[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(json.dumps({"benchmark": name, **results[name]}), flush=True)
            continue
        steady = history[-1]["seconds"]
        n_batches = kw["ntrain"] // cfg.batch_size
        steps_per_sec = n_batches / steady
        full_epoch_s = (cfg.ntrain // cfg.batch_size) / steps_per_sec
        results[name] = {
            "steady_epoch_s_reduced": round(steady, 4),
            "train_steps_per_sec": round(steps_per_sec, 2),
            "pipelined_epoch_s_reduced": round(pipe_steady, 4),
            "pipelined_steps_per_sec": round(n_batches / pipe_steady, 2),
            "extrapolated_full_epoch_s": round(full_epoch_s, 3),
            "final_train_loss": round(history[-1]["train_loss"], 6),
            "compile_plus_first_epoch_s": round(history[0]["seconds"], 1),
            "wall_s": round(time.time() - t0, 1),
        }
        print(json.dumps({"benchmark": name, **results[name]}), flush=True)

    out = os.path.abspath(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "BENCH_SWEEP.json"
        )
    )
    merged = {}
    if os.path.exists(out):
        try:
            merged = json.load(open(out)).get("results", {})
        except Exception:
            pass
    merged.update(results)
    with open(out, "w") as f:
        json.dump(
            {"device": str(jax.devices()[0]), "results": merged}, f, indent=1
        )


if __name__ == "__main__":
    main(sys.argv[1:] or None)
