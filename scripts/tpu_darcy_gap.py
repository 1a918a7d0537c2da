"""Close-or-explain the Darcy 18% vs 6.7%-oracle gap (VERDICT r4 item 4).

The ridge oracle on the EXACT pointwise logit feature reaches ~6.7% test
rel-L2 at ntrain=1024 (slope-independent; BASELINE.md darcy paragraph),
while the 30-epoch reference-budget model sits at ~18%. Which ingredient
owns the gap — budget, capacity, or architecture? Arms (all on the same
synthetic data / seed):

  base          30 epochs, reference config (the headline row)
  epochs500     500 epochs (the TF-family budget), same model
  hid128        30 epochs, hid_dim 128 (2x width)
  blocks8       30 epochs, n_blocks 8 (2x depth)
  epochs500_hid128  the combined arm
  epochs500_hid256  4x width at the 500-epoch budget (capacity ceiling probe)

Writes DARCY_GAP.json (merged by arm). Run on the TPU chip:
    python scripts/tpu_darcy_gap.py [arm ...]
Accuracy conclusions are backend-independent; `--cpu` forces the CPU
backend so the arms can run during a relay outage.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

from position_induced_transformer_tpu import configs
from position_induced_transformer_tpu.train import runner

OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "DARCY_GAP.json"
)


def make_cfg(arm: str):
    cfg = configs.DARCY
    m = cfg.model
    if "hid128" in arm:
        m = dataclasses.replace(m, hid_dim=128)
    if "hid256" in arm:
        m = dataclasses.replace(m, hid_dim=256)
    if "blocks8" in arm:
        m = dataclasses.replace(m, n_blocks=8)
    cfg = dataclasses.replace(cfg, model=m)
    if "epochs500" in arm:
        cfg = dataclasses.replace(cfg, epochs=500)
    return cfg


ARMS = ["base", "epochs500", "hid128", "blocks8", "epochs500_hid128"]


def main(arms):
    results = {}
    if os.path.exists(OUT):
        try:
            results = json.load(open(OUT)).get("results", {})
        except Exception:
            pass
    for arm in arms or ARMS:
        cfg = make_cfg(arm)
        t0 = time.time()
        try:
            _, _, history = runner.train(cfg, verbose=False, sync_every=50)
            results[arm] = {
                "epochs": len(history),
                "device": str(jax.devices()[0]),
                "wall_s": round(time.time() - t0, 1),
                "final": {
                    k: round(v, 6)
                    for k, v in history[-1].items()
                    if k != "epoch"
                },
            }
        except Exception as e:
            results[arm] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({arm: results[arm]}), flush=True)
        with open(OUT, "w") as f:
            json.dump(
                {
                    "oracle_relL2": 0.067,
                    "oracle_note": "ridge on the exact pointwise logit "
                    "feature, ntrain=1024 (BASELINE.md)",
                    "device": str(jax.devices()[0]),
                    "results": results,
                },
                f, indent=1,
            )


if __name__ == "__main__":
    main(sys.argv[1:])
