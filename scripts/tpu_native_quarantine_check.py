"""Empirical check of the native-geometry subprocess quarantine (CLAUDE.md
hazard: any in-process libpitgeom.so call permanently degrades TPU dispatch
~10x in that process).

Sequence: (a) baseline burgers steady epoch throughput; (b) build geometry
through the SUBPROCESS native path (the default on TPU backends); (c)
re-measure — must be unchanged; (d) deliberately poison with an in-process
native call and re-measure, documenting the hazard the quarantine avoids.
Writes NATIVE_QUARANTINE.json.
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

import numpy as np

from position_induced_transformer_tpu import configs
from position_induced_transformer_tpu.train import runner


def steady_epoch_s(tag):
    _, _, history = runner.train(
        configs.get("burgers"), epochs=3, ntrain=256, ntest=32, verbose=False
    )
    s = history[-1]["seconds"]
    print(json.dumps({"stage": tag, "steady_epoch_s": round(s, 4)}), flush=True)
    return s


def main():
    results = {"backend": jax.default_backend()}
    results["baseline_s"] = steady_epoch_s("baseline")

    # (b) subprocess-quarantined native geometry (the default on TPU)
    from position_induced_transformer_tpu.models import build_geometry_host
    from position_induced_transformer_tpu.data import native

    mesh = np.linspace(0, 1, 1025)[:-1].reshape(-1, 1).astype(np.float32)
    ltt = np.linspace(0, 1, 257)[:-1].reshape(-1, 1).astype(np.float32)
    t0 = time.perf_counter()
    geom = build_geometry_host(mesh, ltt, mesh, metric="periodic1d")
    results["subprocess_geometry_s"] = round(time.perf_counter() - t0, 2)
    results["used_subprocess"] = native.load() is not None
    results["after_subprocess_s"] = steady_epoch_s("after_subprocess")

    # (d) deliberately poison: in-process ctypes call, then re-measure
    os.environ["PIT_NATIVE_GEOMETRY"] = "force"
    build_geometry_host(mesh, ltt, mesh, metric="periodic1d")
    results["after_inprocess_s"] = steady_epoch_s("after_inprocess_poison")

    results["quarantine_ok"] = (
        results["after_subprocess_s"] < 1.5 * results["baseline_s"]
    )
    results["hazard_reproduced"] = (
        results["after_inprocess_s"] > 2.0 * results["baseline_s"]
    )
    print(json.dumps(results, indent=1))
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "NATIVE_QUARANTINE.json",
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
