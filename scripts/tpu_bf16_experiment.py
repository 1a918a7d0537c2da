"""Mixed-precision end-to-end A/B on the attached TPU chip.

Measures model.compute_dtype=bfloat16 (bf16 activations, f32 params/
softmax/masks/output — models/pit.py) against the f32 default at the
REAL benchmark configurations, alternating arms within the same session
so relay-load drift cancels (the absolute numbers still swing with relay
load — CLAUDE.md; only the within-run ratio is meaningful).

Reuses the epoch harness from tpu_epoch_sweep (whole-epoch jitted scans,
scalar-readback sync). Writes BF16_AB.json and prints one JSON line per
(benchmark, arm, round).

Usage: python scripts/tpu_bf16_experiment.py [benchmark ...]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import numpy as np
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

from position_induced_transformer_tpu import configs
from tpu_epoch_sweep import SWEEP, measure

# torch-family benchmarks where bf16 activations can move the needle:
# the rollout/bandwidth-bound configs (the wall-clock hogs) plus burgers
# as the small-config no-regression sentinel
DEFAULT = ["vorticity", "cylinder", "burgers"]
ROUNDS = 3


def main(names=None):
    names = names or DEFAULT
    results = {}
    for name in names:
        cfg = configs.get(name)
        kw = SWEEP[name]
        arms = {
            "f32": cfg,
            "bf16": dataclasses.replace(
                cfg,
                model=dataclasses.replace(
                    cfg.model, compute_dtype="bfloat16"
                ),
            ),
        }
        rows = {a: {"pipelined": [], "loss": []} for a in arms}
        for r in range(ROUNDS):
            for arm, c in arms.items():
                t0 = time.time()
                res = measure(c, **kw)
                rows[arm]["pipelined"].append(
                    res["pipelined_epoch_s_reduced"]
                )
                rows[arm]["loss"].append(res["final_train_loss"])
                print(
                    json.dumps(
                        {
                            "benchmark": name,
                            "arm": arm,
                            "round": r,
                            **res,
                            "wall_s": round(time.time() - t0, 1),
                        }
                    ),
                    flush=True,
                )
        med = {a: float(np.median(rows[a]["pipelined"])) for a in arms}
        results[name] = {
            "epoch_s": med,
            "speedup_bf16": round(med["f32"] / med["bf16"], 3),
            # 13 short epochs from the same init: a coarse accuracy
            # sanity signal only (full-budget A/B is the acceptance)
            "final_train_loss": {
                a: rows[a]["loss"][-1] for a in arms
            },
            "rounds": rows,
        }
        print(json.dumps({"benchmark": name, "summary": results[name]["epoch_s"], "speedup_bf16": results[name]["speedup_bf16"]}), flush=True)

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "BF16_AB.json"
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
