"""Evaluation flows: rollout metrics (vorticity/cylinder) via checkpoints."""

import dataclasses
import os

import numpy as np

from position_induced_transformer_tpu import configs
from position_induced_transformer_tpu.train import evaluate, runner


def test_vorticity_rollout_evaluation(tmp_path):
    cfg = dataclasses.replace(
        configs.VORTICITY,
        grid=(16, 16), latent_grid=(8, 8),
        rollout_steps=3, memory=4, batch_size=8,
        model=dataclasses.replace(configs.VORTICITY.model, hid_dim=16, n_blocks=2),
    )
    path = os.path.join(tmp_path, "ckpt")
    runner.train(
        cfg, epochs=1, ntrain=16, ntest=8, verbose=False, checkpoint_path=path
    )
    res = evaluate.evaluate(cfg, checkpoint_path=path, ntest=8)
    assert res["rollout_steps"] == 3
    assert len(res["rel_l2_step"]) == 3
    assert np.isfinite(res["rel_l2_traj"])


def test_cylinder_rollout_evaluation(tmp_path):
    cfg = dataclasses.replace(
        configs.CYLINDER,
        batch_size=10,
        model=dataclasses.replace(configs.CYLINDER.model, hid_dim=16, n_blocks=2),
    )
    path = os.path.join(tmp_path, "ckpt")
    runner.train(
        cfg, epochs=1, ntrain=40, ntest=20, verbose=False, checkpoint_path=path,
        setup_kwargs={"n_points": 64, "n_latent": 16},
    )
    res = evaluate.evaluate(
        cfg, checkpoint_path=path, ntest=20,
        setup_kwargs={"n_points": 64, "n_latent": 16},
    )
    assert "rel_l2" in res
