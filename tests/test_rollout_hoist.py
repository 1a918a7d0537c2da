"""Rollout attention hoisting (Task.rollout_preds / Task.rollout).

Position-attention weights depend only on the bandwidth params and the
geometry — never on the evolving rollout window — so for fixed meshes they
are computed ONCE per optimizer step and passed into the scan, instead of
being recomputed every rollout step (and again in the remat'd backward;
the reference recomputes them per forward, pit.py:46-52, and per rollout
step, train_vorticity.py:118-126 / tensorflow/4_Vorticity/utils.py:115-121).

These tests pin value AND gradient equivalence between the hoisted path
(PIT_ROLLOUT_HOIST=auto/always) and the per-step path (never), for both
model families, plus the guard behaviors.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from position_induced_transformer_tpu import configs
from position_induced_transformer_tpu.train import benchmarks


def _tiny(cfg, **kw):
    model = dataclasses.replace(cfg.model, hid_dim=16, n_blocks=2)
    return dataclasses.replace(cfg, model=model, **kw)


def _init_params(problem, seed=0):
    data = jax.tree_util.tree_map(lambda a: a[:2], problem.train_data)
    if problem.init_fn is not None:
        return problem.init_fn(jax.random.PRNGKey(seed), data)["params"]
    geom = problem.geom
    if problem.task.geom_fn is not None:
        geom = problem.task.geom_fn(data)
    return problem.model.init(
        jax.random.PRNGKey(seed), geom, data["x"]
    )["params"]


def _vorticity_problem(tf=False):
    cfg = _tiny(
        configs.VORTICITY_TF if tf else configs.VORTICITY,
        grid=(16, 16), latent_grid=(8, 8),
        rollout_steps=3, memory=4, batch_size=4,
    )
    return benchmarks.setup(cfg, ntrain=8, ntest=4)


def _loss_and_grads(problem, mode, monkeypatch):
    monkeypatch.setenv("PIT_ROLLOUT_HOIST", mode)
    params = _init_params(problem)
    batch = {
        k: v[: problem.config.batch_size] for k, v in problem.train_data.items()
    }
    loss, grads = jax.value_and_grad(problem.task.loss_fn)(
        params, problem.geom, batch
    )
    return float(loss), grads, params, batch


def _assert_trees_close(a, b, rtol=2e-5, atol=1e-7):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("tf", [False, True], ids=["torch", "tf"])
def test_hoisted_rollout_matches_per_step(tf, monkeypatch):
    """BPTT loss and every parameter gradient agree between the hoisted
    and per-step attention paths (the hoist is an exact refactor: same
    math, softmaxes evaluated once instead of per step)."""
    problem = _vorticity_problem(tf=tf)
    l0, g0, params, batch = _loss_and_grads(problem, "never", monkeypatch)
    l1, g1, _, _ = _loss_and_grads(problem, "always", monkeypatch)
    assert np.isfinite(l0) and np.isfinite(l1)
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    _assert_trees_close(g0, g1)


@pytest.mark.parametrize("tf", [False, True], ids=["torch", "tf"])
def test_hoisted_eval_rollout_matches(tf, monkeypatch):
    """The eval-time autoregressive rollout (Task.rollout) agrees too."""
    problem = _vorticity_problem(tf=tf)
    params = _init_params(problem, seed=1)
    x0 = problem.test_data["x"][:2]
    monkeypatch.setenv("PIT_ROLLOUT_HOIST", "never")
    t0 = problem.task.rollout(params, problem.geom, x0, steps=3)
    monkeypatch.setenv("PIT_ROLLOUT_HOIST", "always")
    t1 = problem.task.rollout(params, problem.geom, x0, steps=3)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1),
                               rtol=2e-5, atol=1e-7)


def test_pit_forward_with_tables_matches_plain():
    """PiT.__call__(atts=...) with precomputed attention_tables is the
    identical forward (the table is the same softmax, just not fused with
    its consumer)."""
    problem = _vorticity_problem(tf=False)
    model, geom = problem.model, problem.geom
    params = _init_params(problem, seed=2)
    x = problem.test_data["x"][:2]
    plain = model.apply({"params": params}, geom, x)
    atts = model.apply({"params": params}, geom, method="attention_tables")
    assert set(atts) == {"down", "proc", "up"}
    assert atts["down"].ndim == 3 and len(atts["proc"]) == model.n_blocks
    hoisted = model.apply({"params": params}, geom, x, atts=atts)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(hoisted),
                               rtol=2e-5, atol=1e-7)


def test_always_raises_for_per_sample_geometry(monkeypatch):
    """PIT_ROLLOUT_HOIST=always is a measurement guard: it must error,
    not silently fall back, when the task cannot hoist (per-sample
    geometry => data-dependent attention)."""
    cfg = _tiny(configs.ELASTICITY, batch_size=4)
    problem = benchmarks.setup(cfg, ntrain=8, ntest=4)
    params = _init_params(problem)
    batch = {k: v[:4] for k, v in problem.train_data.items()}
    monkeypatch.setenv("PIT_ROLLOUT_HOIST", "always")
    g = problem.task._geometry(problem.geom, batch)
    with pytest.raises(ValueError, match="cannot hoist"):
        problem.task._rollout_hoist(params, g)
    # auto silently skips for the same task
    monkeypatch.setenv("PIT_ROLLOUT_HOIST", "auto")
    assert problem.task._rollout_hoist(params, g) == (None, None)


def test_unknown_hoist_mode_raises(monkeypatch):
    problem = _vorticity_problem(tf=False)
    params = _init_params(problem)
    monkeypatch.setenv("PIT_ROLLOUT_HOIST", "alwyas")
    with pytest.raises(ValueError, match="PIT_ROLLOUT_HOIST"):
        problem.task._rollout_hoist(params, problem.geom)


def test_selfatt_variant_has_no_tables(monkeypatch):
    """An all-self-attention ablation variant has nothing to hoist: every
    logit involves Q/K projections of the data. auto must skip."""
    cfg = _tiny(
        configs.VORTICITY_TF,
        grid=(16, 16), latent_grid=(8, 8),
        rollout_steps=2, memory=4, batch_size=4,
        model_variant="transformer",
    )
    problem = benchmarks.setup(cfg, ntrain=8, ntest=4)
    params = _init_params(problem)
    monkeypatch.setenv("PIT_ROLLOUT_HOIST", "auto")
    assert problem.task._rollout_hoist(params, problem.geom) == (None, None)
    # and training still works end to end through the no-table path
    batch = {k: v[:4] for k, v in problem.train_data.items()}
    loss = problem.task.loss_fn(params, problem.geom, batch)
    assert np.isfinite(float(loss))
