"""Full reference-budget training runs on the attached TPU chip.

Runs each named benchmark at its COMPLETE reference configuration (full
ntrain/epochs, synthetic data when real datasets are absent) and records
wall time, steady-state s/epoch and final metrics — the source of the
"Full reference-budget training runs" tables in BASELINE.md.

Usage: python scripts/tpu_full_budget.py [benchmark[:variant] ...]
       (default: all 13; results merged into FULL_BUDGET.json;
       'burgers_tf:lite' trains the LiteTransformer ablation variant)

Note: first-time compiles of full-size epoch scans are minutes through
this environment's remote-compile relay (CLAUDE.md) — the process can
look idle while the server compiles; let it run.
"""

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

ALL = [
    "burgers", "sod", "darcy", "vorticity", "elasticity", "naca", "cylinder",
    "burgers_tf", "sod_tf", "darcy_tf", "vorticity_tf", "elasticity_tf",
    "naca_tf",
]

OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "FULL_BUDGET.json"
)


# benchmarks whose round-5 surrogates probe operator learning: record the
# model-level input-shuffle ablation (BASELINE.md surrogate note) — test
# rel-L2 with true inputs vs inputs shuffled across samples. Large
# inflation = the trained model actually uses the input function.
SHUFFLE_BENCHES = ("naca", "elasticity", "cylinder", "naca_tf", "elasticity_tf")


def shuffle_metrics(bench: str, problem, state) -> dict:
    """Delegates to the framework's operator-learning probe
    (train/evaluate.input_shuffle_ablation, also exposed as
    ``evaluate --shuffle-ablation``); kept as a named hook so the
    FULL_BUDGET artifact keys stay stable."""
    from position_induced_transformer_tpu.train.evaluate import (
        input_shuffle_ablation,
    )

    return input_shuffle_ablation(problem, state)


def run_one(name: str) -> dict:
    bench, _, variant = name.partition(":")
    cfg = configs.get(bench)
    if variant == "bf16":  # mixed-precision arm ('vorticity:bf16'), not a
        # model ablation: compute_dtype override (models/pit.py)
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"),
        )
        variant = ""
    # the darcy family's headline capability is the zero-shot 421^2
    # super-resolution transfer (reference: tensorflow/README.md:5,
    # train_darcy.py:151-180) — checkpoint the run and record it
    zssr_ckpt = None
    if bench.startswith("darcy"):
        zssr_ckpt = os.path.join(
            os.path.dirname(OUT), ".full_budget_ckpt", name.replace(":", "_")
        )
        os.makedirs(zssr_ckpt, exist_ok=True)
    t0 = time.time()
    problem, state, history = runner.train(
        cfg, verbose=False, sync_every=50, model_variant=variant or None,
        checkpoint_path=zssr_ckpt,
    )
    wall = time.time() - t0
    tail = [h["seconds"] for h in history[5:]] or [history[-1]["seconds"]]
    out = {
        "epochs": len(history),
        "wall_s": round(wall, 1),
        "steady_epoch_s": round(sorted(tail)[len(tail) // 2], 4),
        "final": {
            k: round(v, 6) for k, v in history[-1].items() if k != "epoch"
        },
    }
    if bench in SHUFFLE_BENCHES and not variant:
        try:
            out["shuffle"] = shuffle_metrics(bench, problem, state)
        except Exception as e:
            out["shuffle"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    if zssr_ckpt is not None:
        from position_induced_transformer_tpu.train import evaluate

        res = evaluate.evaluate(
            cfg, zssr_ckpt, zssr=True, model_variant=variant or None
        )
        out["zssr_421"] = {
            k: round(v, 6)
            for k, v in res.items()
            if isinstance(v, float)
        }
    return out


def _merge_write(name, row):
    """Re-read OUT at every write and merge one row: a process holding a
    startup snapshot clobbers any concurrent writer's rows (this bit on
    2026-08-20 when an outage-stalled queue resumed next to its
    replacement — the resumed fullbf16 step erased two fresh rows).

    Writes go to a temp file + os.replace so a concurrent reader can never
    observe a truncated JSON (which would make ITS merge start from {} and
    erase every other row — the same clobber through a different door)."""
    results = {}
    if os.path.exists(OUT):
        try:
            results = json.load(open(OUT)).get("results", {})
        except Exception:
            pass
    results[name] = row
    tmp = OUT + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(
            {"device": str(jax.devices()[0]), "results": results},
            f, indent=1,
        )
    os.replace(tmp, OUT)


def main(names):
    for name in names or ALL:
        try:
            row = run_one(name)
        except Exception as e:  # record and continue
            row = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({name: row}), flush=True)
        _merge_write(name, row)


if __name__ == "__main__":
    main(sys.argv[1:])
