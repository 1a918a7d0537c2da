"""Per-benchmark training throughput sweep on the attached TPU chip.

Runs every benchmark at its REAL model configuration (synthetic data,
reduced ntrain so the sweep stays tractable) and reports steady-state
seconds/epoch two ways:

- ``pipelined``: K epochs (train scan + eval scan each) dispatched
  back-to-back with ONE device->host sync at the end — the production
  configuration (runner sync_every=0); this is device throughput.
- ``synced``: the same loop with the metric scalars read back every epoch
  (runner sync_every=1) — comparable to the reference's per-epoch printed
  wall time, and sensitive to this environment's tunnel readback latency.

Timing avoids runner.train re-invocation (setup + retrace noise): one
setup per benchmark, direct epoch dispatches, warm epoch excluded.
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
from position_induced_transformer_tpu.train import benchmarks, runner
from position_induced_transformer_tpu.train.loop import (
    epoch_permutation,
    eval_permutation,
    make_eval_epoch,
    make_optimizer,
    make_train_epoch,
)

# per-benchmark reduced sample counts (shapes/model stay full-size)
SWEEP = {
    "burgers": dict(ntrain=256, ntest=32),
    "sod": dict(ntrain=256, ntest=32),
    "darcy": dict(ntrain=256, ntest=20),
    "vorticity": dict(ntrain=100, ntest=20),
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


def measure(cfg, ntrain, ntest, k_epochs=8):
    problem = benchmarks.setup(cfg, ntrain=ntrain, ntest=ntest)
    n_batches = ntrain // cfg.batch_size
    optimizer = make_optimizer(cfg.lr, cfg.epochs * n_batches)
    state = runner.init_state(problem, optimizer, seed=0)
    train_epoch = make_train_epoch(problem.task, optimizer)
    metrics = None if cfg.rollout_steps else runner.default_metrics(
        cfg.model.out_dim
    )
    eval_epoch = make_eval_epoch(problem.task, metrics)
    eval_bs = min(cfg.eval_batch_size or cfg.batch_size, problem.n_test)
    eval_perm = eval_permutation(problem.n_test, eval_bs)

    def one_epoch(state, ep):
        perm = epoch_permutation(
            jax.random.fold_in(jax.random.PRNGKey(cfg.seed), ep),
            problem.n_train, cfg.batch_size,
        )
        state, loss = train_epoch(state, problem.geom, problem.train_data, perm)
        evals = eval_epoch(state, problem.geom, problem.test_data, eval_perm)
        return state, loss, evals

    def sync(loss, evals):
        vals = [float(loss)] + [float(v) for v in evals.values()]
        return vals[0]

    # warm/compile
    t0 = time.perf_counter()
    state, loss, evals = one_epoch(state, 0)
    final_loss = sync(loss, evals)
    compile_s = time.perf_counter() - t0

    # pipelined: dispatch k epochs, one sync at the end
    t0 = time.perf_counter()
    for ep in range(1, 1 + k_epochs):
        state, loss, evals = one_epoch(state, ep)
    final_loss = sync(loss, evals)
    pipelined = (time.perf_counter() - t0) / k_epochs

    # synced: readback every epoch
    t0 = time.perf_counter()
    for ep in range(1 + k_epochs, 1 + 2 * k_epochs):
        state, loss, evals = one_epoch(state, ep)
        final_loss = sync(loss, evals)
    synced = (time.perf_counter() - t0) / k_epochs

    denom = n_batches if problem.task.batch_mean_loss else ntrain
    if cfg.rollout_steps and not problem.task.trajectory_loss:
        denom *= cfg.rollout_steps
    return {
        "pipelined_epoch_s_reduced": round(pipelined, 4),
        "pipelined_steps_per_sec": round(n_batches / pipelined, 2),
        "synced_epoch_s_reduced": round(synced, 4),
        "synced_steps_per_sec": round(n_batches / synced, 2),
        "extrapolated_full_epoch_s": round(
            (cfg.ntrain // cfg.batch_size) * pipelined / n_batches, 3
        ),
        "final_train_loss": round(final_loss / denom, 6),
        "compile_plus_first_epoch_s": round(compile_s, 1),
    }


def main(names=None):
    results = {}
    for name, kw in SWEEP.items():
        if names and name not in names:
            continue
        cfg = configs.get(name)
        t0 = time.time()
        try:
            results[name] = measure(cfg, **kw)
            results[name]["wall_s"] = round(time.time() - t0, 1)
        except Exception as e:  # record and continue the sweep
            results[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
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
