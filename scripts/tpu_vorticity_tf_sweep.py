"""Why doesn't vorticity_tf converge where torch-family vorticity does?

Controlled sweep on the TPU chip (reduced ntrain so each cell is minutes):
the reference TF config (lr 1e-3, batch 8, no normalization, trajectory
loss over a 20-step in-graph rollout — tensorflow/4_Vorticity/train.py)
against lower learning rates and amplitude-normalized data, measuring the
stepwise rel-L2 trajectory. The torch family differs by InstanceNorm,
2 heads, batch 20 and per-step summed loss; this sweep isolates which
knob actually gates convergence on the synthetic surrogate.

Writes VORTICITY_TF_SWEEP.json.
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

import dataclasses

import jax.numpy as jnp

from position_induced_transformer_tpu import configs
from position_induced_transformer_tpu.train import benchmarks, runner

NTRAIN, NTEST, EPOCHS = 200, 40, 120


def run_cell(name, lr=None, scale=None, use_instance_norm=False):
    cfg = configs.get("vorticity_tf")
    if lr is not None:
        cfg = dataclasses.replace(cfg, lr=lr)
    if use_instance_norm:
        # not part of the reference TF config — diagnostic only
        raise NotImplementedError
    # runner.train with a data-scaling hook: monkey-scale via setup + manual
    problem = benchmarks.setup(cfg, ntrain=NTRAIN, ntest=NTEST)
    if scale is not None:
        s = scale / float(jnp.std(problem.train_data["x"]))
        for d in (problem.train_data, problem.test_data):
            d["x"] = d["x"] * s
            d["y"] = d["y"] * s
    from position_induced_transformer_tpu.train.loop import (
        TrainState,
        epoch_permutation,
        eval_permutation,
        make_eval_epoch,
        make_optimizer,
        make_train_epoch,
    )

    n_batches = NTRAIN // cfg.batch_size
    optimizer = make_optimizer(cfg.lr, EPOCHS * n_batches)
    state = runner.init_state(problem, optimizer, seed=0)
    train_epoch = make_train_epoch(problem.task, optimizer)
    eval_epoch = make_eval_epoch(problem.task, None)
    eval_perm = eval_permutation(NTEST, min(cfg.batch_size, NTEST))

    hist = []
    t0 = time.time()
    for ep in range(EPOCHS):
        perm = epoch_permutation(
            jax.random.fold_in(jax.random.PRNGKey(0), ep),
            NTRAIN, cfg.batch_size,
        )
        state, loss = train_epoch(
            state, problem.geom, problem.train_data, perm
        )
        if (ep + 1) % 20 == 0:
            evals = eval_epoch(
                state, problem.geom, problem.test_data, eval_perm, NTEST
            )
            hist.append(
                {
                    "epoch": ep,
                    "rel_l2_step": round(
                        float(evals["rel_l2_step"]) / NTEST, 4
                    ),
                    "rel_l2_final": round(
                        float(evals["rel_l2_final"]) / NTEST, 4
                    ),
                }
            )
    out = {
        "name": name,
        "lr": cfg.lr if lr is None else lr,
        "scale": scale,
        "wall_s": round(time.time() - t0, 1),
        "history": hist,
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    cells = [
        ("reference", dict()),
        ("lr_3e-4", dict(lr=3e-4)),
        ("lr_1e-4", dict(lr=1e-4)),
        ("unit_scale", dict(scale=1.0)),
        ("small_scale", dict(scale=0.3)),
        ("lr_3e-4_unit_scale", dict(lr=3e-4, scale=1.0)),
    ]
    results = [run_cell(n, **kw) for n, kw in cells]
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "VORTICITY_TF_SWEEP.json"), "w",
    ) as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
