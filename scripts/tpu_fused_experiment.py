"""End-to-end fused-kernel dispatch experiment on the TPU chip.

The per-call kernel-vs-XLA micro-benchmarks (scripts/tpu_checks.py) sit on
the ~1.6 ms host-dispatch floor at the reference training shapes, so they
cannot decide whether the fused Pallas posatt should engage during
training. This measures the decisive quantity instead: steady-state epoch
seconds for each fixed-mesh benchmark with PIT_FUSED_MODE=never vs always
(the mode is read at trace time in models/pit.py _dispatch_posatt).

Writes FUSED_SWEEP.json: per benchmark {never_s, always_s, speedup}.
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

SWEEP = {
    "burgers": dict(ntrain=256, ntest=32),
    "sod": dict(ntrain=256, ntest=32),
    "darcy": dict(ntrain=256, ntest=20),
    "vorticity": dict(ntrain=100, ntest=20),
    "cylinder": dict(ntrain=1000, ntest=100),
}


def run_one(name, kw, mode, epochs=3):
    os.environ["PIT_FUSED_MODE"] = mode
    cfg = configs.get(name)
    t0 = time.time()
    _, _, history = runner.train(cfg, epochs=epochs, verbose=False, **kw)
    return {
        "steady_epoch_s": round(history[-1]["seconds"], 4),
        "wall_s": round(time.time() - t0, 1),
        "final_train_loss": round(history[-1]["train_loss"], 6),
    }


def main(names=None):
    out_path = os.path.abspath(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "FUSED_SWEEP.json")
    )
    results = {}
    if os.path.exists(out_path):
        try:
            results = json.load(open(out_path)).get("results", {})
        except Exception:
            pass
    for name, kw in SWEEP.items():
        if names and name not in names:
            continue
        row = {}
        for mode in ("never", "always"):
            try:
                row[mode] = run_one(name, kw, mode)
            except Exception as e:
                row[mode] = {"error": f"{type(e).__name__}: {e}"[:300]}
        if "error" not in row["never"] and "error" not in row["always"]:
            row["speedup_always_over_never"] = round(
                row["never"]["steady_epoch_s"] / row["always"]["steady_epoch_s"], 3
            )
        results[name] = row
        print(json.dumps({"benchmark": name, **row}), flush=True)
        with open(out_path, "w") as f:
            json.dump(
                {"device": str(jax.devices()[0]), "results": results}, f, indent=1
            )


if __name__ == "__main__":
    main(sys.argv[1:] or None)
