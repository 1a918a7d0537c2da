"""Checkpoint evaluation, including Darcy zero-shot super-resolution.

Capability parity with the reference eval flows: final test metrics
(train_burgers.py:128-131), the 43^2-trained -> 421^2 ZSSR evaluation
(train_darcy.py:151-180), and TF-side ``evaluate.py`` scripts that rebuild
the model at a new resolution and transplant weights
(tensorflow/3_Darcy2D/evaluate.py:47-60). Here "rebuilding" is just binding
the same resolution-independent params to a new Geometry.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from position_induced_transformer_tpu.configs import get
from position_induced_transformer_tpu.ops.metrics import (
    rel_lp_norm,
    rel_max_norm,
)
from position_induced_transformer_tpu.train import benchmarks
from position_induced_transformer_tpu.train import checkpoint as ckpt
from position_induced_transformer_tpu.train.loop import TrainState
from position_induced_transformer_tpu.train.runner import predict


def evaluate(
    config: str,
    checkpoint_path: str,
    data_path: Optional[str] = None,
    ntest: Optional[int] = None,
    zssr: bool = False,
    save_pred: Optional[str] = None,
) -> dict:
    cfg = get(config) if isinstance(config, str) else config
    setup_kwargs = {}
    if zssr:
        if cfg.name != "darcy":
            raise ValueError("--zssr is a Darcy-benchmark capability")
        setup_kwargs["downsampling"] = 1  # full 421^2 resolution
    problem = benchmarks.setup(cfg, data_path, ntest=ntest, **setup_kwargs)

    restored = ckpt.restore(checkpoint_path)
    params = restored["params"] if "params" in restored else restored
    state = TrainState(params, None, 0)

    pred = predict(problem, state)
    true = np.asarray(problem.test_data["y"])[: pred.shape[0]]
    n = pred.shape[0]
    out_dim = cfg.model.out_dim
    result = {
        "benchmark": cfg.name,
        "n_test": n,
        "zssr": zssr,
        "rel_l1": float(rel_lp_norm(true, pred, out_dim, 1)) / n,
        "rel_l2": float(rel_lp_norm(true, pred, out_dim, 2)) / n,
        "rel_max": float(rel_max_norm(true, pred, out_dim)) / n,
    }
    if save_pred:
        from scipy.io import savemat

        savemat(save_pred, {"pred": pred, "true": true})
    return result
