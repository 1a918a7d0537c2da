"""End-to-end smoke training on synthetic data: every benchmark family
trains for a couple of tiny epochs under jit and the loss decreases.

This is the integration layer the reference verifies only empirically
(SURVEY.md §4) — here it is CI.
"""

import dataclasses

import numpy as np
import pytest

from position_induced_transformer_tpu import configs
from position_induced_transformer_tpu.train import runner


def _tiny(cfg: configs.BenchmarkConfig, **kw) -> configs.BenchmarkConfig:
    """Shrink a benchmark config for CI."""
    model = dataclasses.replace(cfg.model, hid_dim=16, n_blocks=2)
    return dataclasses.replace(cfg, model=model, **kw)


def _run(cfg, epochs=3, ntrain=32, ntest=16, **kw):
    problem, state, history = runner.train(
        cfg, epochs=epochs, ntrain=ntrain, ntest=ntest, verbose=False, **kw
    )
    losses = [h["train_loss"] for h in history]
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    return problem, state, history


def test_burgers_e2e():
    cfg = _tiny(
        configs.BURGERS, grid=(64,), latent_grid=(16,), batch_size=8
    )
    problem, state, history = _run(cfg)
    # eval metrics present and finite
    assert {"rel_l1", "rel_l2", "rel_max"} <= set(history[-1])


def test_sod_e2e():
    cfg = _tiny(configs.SOD, latent_grid=(16,), batch_size=8)
    _run(cfg)


def test_darcy_e2e_with_normalizers():
    cfg = _tiny(configs.DARCY, grid=(22, 22), latent_grid=(8, 8), batch_size=8)
    problem, state, history = _run(cfg, epochs=3)
    assert problem.y_normalizer is not None


def test_vorticity_e2e_rollout_bptt():
    cfg = _tiny(
        configs.VORTICITY,
        grid=(16, 16), latent_grid=(8, 8),
        rollout_steps=3, memory=4, batch_size=8,
    )
    problem, state, history = _run(cfg, epochs=2, ntrain=16, ntest=8)


def test_elasticity_e2e_batched_mesh():
    cfg = _tiny(configs.ELASTICITY, batch_size=4)
    # shrink the point cloud via synthetic loader defaults by patching ntrain
    problem, state, history = _run(cfg, epochs=2, ntrain=16, ntest=8)


def test_cylinder_e2e_residual():
    cfg = _tiny(configs.CYLINDER, batch_size=10)
    problem, state, history = _run(cfg, epochs=2, ntrain=40, ntest=20)
    # rollout evaluation path
    import jax.numpy as jnp

    x0 = problem.test_data["x"][:2]
    traj = problem.task.rollout(state.params, problem.geom, x0, steps=3)
    assert traj.shape == x0.shape + (3,)
    assert bool(jnp.all(jnp.isfinite(traj)))


def test_burgers_tf_family_e2e():
    cfg = _tiny(
        configs.BURGERS_TF, grid=(64,), latent_grid=(32,), batch_size=8
    )
    _run(cfg)


def test_darcy_tf_family_e2e():
    cfg = _tiny(
        configs.DARCY_TF, grid=(22, 22), latent_grid=(8, 8), batch_size=8
    )
    problem, state, history = _run(
        cfg, setup_kwargs={"downsampling": 20}
    )
    assert problem.y_normalizer is not None


def test_vorticity_tf_family_e2e():
    cfg = _tiny(
        configs.VORTICITY_TF,
        grid=(16, 16), latent_grid=(8, 8),
        rollout_steps=3, memory=4, batch_size=8,
    )
    _run(cfg, epochs=2, ntrain=16, ntest=8)


def test_sod_tf_family_e2e():
    cfg = _tiny(
        configs.SOD_TF, grid=(64,), latent_grid=(32,), batch_size=8
    )
    _run(cfg)


def test_elasticity_tf_family_e2e():
    cfg = _tiny(configs.ELASTICITY_TF, batch_size=4)
    _run(cfg, epochs=2, ntrain=16, ntest=8, setup_kwargs={"n_points": 48})


def test_naca_tf_family_e2e():
    cfg = _tiny(
        configs.NACA_TF, grid=(21, 11), latent_grid=(11, 6), batch_size=4
    )
    _run(cfg, epochs=2, ntrain=16, ntest=8)
