"""vorticity_tf published-config seed ensemble (VERDICT r4 item 7).

The published TF vorticity config (f32, lr 1e-3, no normalization layer,
20-step trajectory loss) sits on a stability knife-edge on the synthetic
fast-evolving data: seed 0 collapses to the predict-zero plateau while
other seeds/precisions/lrs converge (BASELINE.md knife-edge paragraph).
To stop the headline table leading with one collapsed seed, run the
published config over a seed ensemble at 120 epochs (the sweep horizon
of VORTICITY_TF_SWEEP.json) and record the per-seed stepwise rel-L2 and
the convergence fraction.

Writes VORTICITY_TF_ENSEMBLE.json. Run on the TPU chip:
    python scripts/tpu_vorticity_tf_ensemble.py [n_seeds] [epochs]
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

OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..",
    "VORTICITY_TF_ENSEMBLE.json",
)

# a run that beats the persistence-baseline plateau (~1.0) by 2x counts
# as converging (the converged arms in BASELINE.md all reach <= 0.5 by
# epoch 120 and keep falling; the collapsed ones plateau at ~1.0-1.13)
CONVERGED_BELOW = 0.5


def main(n_seeds=5, epochs=120):
    results = {}
    if os.path.exists(OUT):
        try:
            results = json.load(open(OUT)).get("seeds", {})
        except Exception:
            pass
    cfg = configs.get("vorticity_tf")
    # extra arm: the round-5 generic stabilizer — seed 0 (the collapsing
    # seed) with a 500-step (~4-epoch) linear LR warmup, same config
    # otherwise (configs.BenchmarkConfig.warmup_steps)
    import dataclasses

    arms = [(str(s), cfg, s) for s in range(n_seeds)]
    arms.append(
        ("0_warmup500", dataclasses.replace(cfg, warmup_steps=500), 0)
    )
    for key, cfg, seed in arms:
        if key in results and "error" not in results.get(key, {}):
            continue
        t0 = time.time()
        try:
            _, _, history = runner.train(
                cfg, epochs=epochs, seed=seed, verbose=False, sync_every=20,
                schedule_epochs=cfg.epochs,  # published 500-epoch decay
            )
            final = history[-1]
            results[key] = {
                "epochs": len(history),
                "wall_s": round(time.time() - t0, 1),
                "rel_l2_step": round(float(final["rel_l2_step"]), 6),
                "rel_l2_final": round(float(final["rel_l2_final"]), 6),
                "converged": bool(final["rel_l2_step"] < CONVERGED_BELOW),
            }
        except Exception as e:
            results[key] = {"error": f"{type(e).__name__}: {e}"[:300]}
        done = [r for r in results.values() if "rel_l2_step" in r]
        summary = {
            "n": len(done),
            "converged": sum(r["converged"] for r in done),
            "rel_l2_step_per_seed": {
                k: r.get("rel_l2_step") for k, r in sorted(results.items())
            },
        }
        print(json.dumps({key: results[key], "summary": summary}), flush=True)
        with open(OUT, "w") as f:
            json.dump(
                {
                    "config": "published vorticity_tf (f32, lr 1e-3, "
                    f"{epochs}-epoch horizon of the 500-epoch cosine)",
                    "converged_below": CONVERGED_BELOW,
                    "device": str(jax.devices()[0]),
                    "seeds": results,
                    "summary": summary,
                },
                f, indent=1,
            )


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 5,
        int(sys.argv[2]) if len(sys.argv) > 2 else 120,
    )
