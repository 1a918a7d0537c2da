"""Profile the vorticity_tf training epoch on the TPU chip: where do its
seconds/epoch go, and how do they split vs the torch-family vorticity
config on the same 20-step rollout? (VERDICT r2 weak #4 follow-up.)

Method (CLAUDE.md tunnel rules): jax.profiler.trace around ONE steady-state
epoch dispatch, then aggregate the device trace's op durations by fusion
name. Also reports per-sample throughput for both vorticity configs from a
scan-amortized timing with a scalar-readback barrier.
"""

import glob
import gzip
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
    make_optimizer,
    make_train_epoch,
)


def setup_epoch(name, ntrain, ntest):
    cfg = configs.get(name)
    problem = benchmarks.setup(cfg, ntrain=ntrain, ntest=ntest)
    optimizer = make_optimizer(cfg.lr, 1000)
    state = runner.init_state(problem, optimizer, seed=0)
    train_epoch = make_train_epoch(problem.task, optimizer)
    return cfg, problem, state, train_epoch


def steady_epoch_seconds(cfg, problem, state, train_epoch, reps=5):
    perm = epoch_permutation(0, problem.n_train, cfg.batch_size)
    state, loss = train_epoch(state, problem.geom, problem.train_data, perm)
    float(loss)  # compile + settle (scalar D2H read drains the pipeline)
    t0 = time.perf_counter()
    for r in range(1, reps + 1):
        perm = epoch_permutation(r, problem.n_train, cfg.batch_size)
        state, loss = train_epoch(
            state, problem.geom, problem.train_data, perm
        )
    float(loss)
    dt = (time.perf_counter() - t0) / reps
    return state, dt, perm


def trace_epoch(name, outdir, cfg, problem, state, train_epoch, perm):
    with jax.profiler.trace(outdir):
        state, loss = train_epoch(
            state, problem.geom, problem.train_data, perm
        )
        float(loss)
    return aggregate_trace(outdir)


def aggregate_trace(outdir, top=25):
    """Leaf HLO ops on the device lane, aggregated by (hlo_category,
    output shape); while/control-flow scopes excluded (they enclose the
    leaves and would double-count)."""
    import re

    files = glob.glob(
        os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True
    )
    if not files:
        return []
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    dev_pids = {
        ev["pid"]
        for ev in trace["traceEvents"]
        if ev.get("ph") == "M"
        and ev.get("name") == "process_name"
        and "TPU" in (ev.get("args") or {}).get("name", "")
    }
    agg, whiles = {}, 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        args = ev.get("args") or {}
        cat = args.get("hlo_category")
        if not cat:
            continue
        if "while" in cat.lower() or "control" in cat.lower():
            whiles += ev["dur"] / 1e6
            continue
        ln = args.get("long_name", ev.get("name", ""))
        m = re.search(r"= (\S+?)\{", ln)
        shape = m.group(1) if m else "?"
        key = f"{cat} {shape}"
        agg[key] = agg.get(key, 0.0) + ev["dur"] / 1e6
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    return [("while_scope_total", whiles)] + rows


def main():
    names = sys.argv[1:] or ["vorticity_tf", "vorticity"]
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "VORTICITY_TF_PROFILE.json",
    )
    out = {}
    if os.path.exists(path):  # merge: selective runs refresh their keys
        try:
            out = json.load(open(path))
        except Exception:
            pass
    for name in names:
        ntrain = 80 if name == "vorticity_tf" else 100
        cfg, problem, state, train_epoch = setup_epoch(name, ntrain, 16)
        state, dt, perm = steady_epoch_seconds(
            cfg, problem, state, train_epoch
        )
        n_steps = problem.n_train // cfg.batch_size
        per_sample = dt / (n_steps * cfg.batch_size)
        print(
            json.dumps(
                {
                    "benchmark": name,
                    "epoch_s_reduced": round(dt, 4),
                    "steps_per_s": round(n_steps / dt, 2),
                    "samples_per_s": round(1.0 / per_sample, 1),
                    "batch_size": cfg.batch_size,
                }
            ),
            flush=True,
        )
        tdir = f"/tmp/vort_trace_{name}"
        rows = trace_epoch(name, tdir, cfg, problem, state, train_epoch, perm)
        out[name] = rows
        for op, sec in rows[:15]:
            print(f"  {sec:8.4f} s  {op[:110]}", flush=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
