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


def test_infer_matches_predict_burgers(tmp_path):
    """infer() on a user .npy batch == runner.predict on the same inputs
    (fixed-mesh benchmark, no input normalization)."""
    import jax

    cfg = dataclasses.replace(
        configs.BURGERS,
        grid=(64,), latent_grid=(16,), batch_size=8,
        model=dataclasses.replace(configs.BURGERS.model, hid_dim=16, n_blocks=2),
    )
    path = os.path.join(tmp_path, "ckpt")
    problem, state, _ = runner.train(
        cfg, epochs=1, ntrain=16, ntest=8, verbose=False, checkpoint_path=path
    )
    x = np.asarray(problem.test_data["x"])[:5]  # odd n: exercises tail pad
    inp = os.path.join(tmp_path, "inp.npy")
    np.save(inp, x)
    out = os.path.join(tmp_path, "pred.npy")
    res = evaluate.infer(
        cfg, checkpoint_path=path, input_path=inp, output_path=out,
    )
    assert res["n"] == 5
    want = runner.predict(problem, state, data={"x": problem.test_data["x"][:5]})
    np.testing.assert_allclose(np.load(out), want, rtol=1e-5, atol=1e-6)


def test_infer_darcy_normalizes_raw_inputs(tmp_path):
    """infer() accepts RAW darcy inputs: applying the checkpoint's training
    x-statistics internally must reproduce predict() on the benchmark's
    own (pre-normalized) test inputs."""
    import jax.numpy as jnp

    cfg = dataclasses.replace(
        configs.DARCY,
        model=dataclasses.replace(configs.DARCY.model, hid_dim=16, n_blocks=2),
        latent_grid=(8, 8), batch_size=4,
    )
    path = os.path.join(tmp_path, "ckpt")
    problem, state, _ = runner.train(
        cfg, epochs=1, ntrain=8, ntest=4, verbose=False, checkpoint_path=path,
        setup_kwargs={"downsampling": 30},
    )
    s = problem.extras["s"]
    x_norm_flat = np.asarray(problem.test_data["x"])  # (N, s*s, 1) normalized
    raw = np.asarray(
        problem.x_normalizer.denormalize(
            jnp.asarray(x_norm_flat.reshape(-1, s, s, 1))
        )
    )
    inp = os.path.join(tmp_path, "inp.npy")
    np.save(inp, raw)  # grid-shaped RAW input
    res = evaluate.infer(
        cfg, checkpoint_path=path, input_path=inp,
        output_path=os.path.join(tmp_path, "pred.mat"),
        setup_kwargs={"downsampling": 30},
    )
    from scipy.io import loadmat

    pred = loadmat(os.path.join(tmp_path, "pred.mat"))["pred"]
    want = runner.predict(problem, state)
    np.testing.assert_allclose(pred, want, rtol=1e-4, atol=1e-5)


def test_infer_rollout_and_mat_input(tmp_path):
    """infer() rolls an autoregressive benchmark forward from a .mat input
    batch for a caller-chosen horizon."""
    from scipy.io import savemat

    cfg = dataclasses.replace(
        configs.VORTICITY,
        grid=(16, 16), latent_grid=(8, 8),
        rollout_steps=3, memory=4, batch_size=8,
        model=dataclasses.replace(configs.VORTICITY.model, hid_dim=16, n_blocks=2),
    )
    path = os.path.join(tmp_path, "ckpt")
    problem, state, _ = runner.train(
        cfg, epochs=1, ntrain=16, ntest=8, verbose=False, checkpoint_path=path
    )
    x0 = np.asarray(problem.test_data["x"])[:3]  # (3, L, memory)
    inp = os.path.join(tmp_path, "inp.mat")
    savemat(inp, {"x": x0})
    res = evaluate.infer(
        cfg, checkpoint_path=path, input_path=inp, rollout_steps=5,
    )
    assert res["rollout_steps"] == 5
    assert res["pred_shape"][0] == 3 and res["pred_shape"][-1] == 5


def test_infer_bad_inputs_clean_errors(tmp_path):
    cfg = dataclasses.replace(
        configs.BURGERS,
        grid=(64,), latent_grid=(16,), batch_size=8,
        model=dataclasses.replace(configs.BURGERS.model, hid_dim=16, n_blocks=2),
    )
    path = os.path.join(tmp_path, "ckpt")
    runner.train(
        cfg, epochs=1, ntrain=16, ntest=8, verbose=False, checkpoint_path=path
    )
    import pytest

    bad = os.path.join(tmp_path, "bad.npy")
    np.save(bad, np.ones((2, 7, 3), np.float32))  # wrong sample shape
    with pytest.raises(ValueError, match="does not match"):
        evaluate.infer(cfg, checkpoint_path=path, input_path=bad)
    with pytest.raises(ValueError, match="unsupported input format"):
        evaluate.infer(cfg, checkpoint_path=path, input_path="x.csv")
    from scipy.io import savemat

    m = os.path.join(tmp_path, "in.mat")
    savemat(m, {"u": np.ones((2, 64, 1), np.float32)})
    with pytest.raises(KeyError, match="not found"):
        evaluate.infer(cfg, checkpoint_path=path, input_path=m)


def test_infer_tf_family(tmp_path):
    """infer() over a TF-semantics benchmark (apply_fn call signature,
    batch-mean loss family) matches runner.predict."""
    cfg = dataclasses.replace(
        configs.BURGERS_TF,
        grid=(64,), latent_grid=(64,), batch_size=8,
        model=dataclasses.replace(
            configs.BURGERS_TF.model, hid_dim=16, n_blocks=2
        ),
    )
    path = os.path.join(tmp_path, "ckpt")
    problem, state, _ = runner.train(
        cfg, epochs=1, ntrain=16, ntest=8, verbose=False, checkpoint_path=path
    )
    x = np.asarray(problem.test_data["x"])[:3]
    inp = os.path.join(tmp_path, "inp.npy")
    np.save(inp, x)
    res = evaluate.infer(cfg, checkpoint_path=path, input_path=inp)
    assert res["n"] == 3
    want = runner.predict(problem, state, data={"x": problem.test_data["x"][:3]})
    # re-run through infer's own problem rebuild; same params, same geom
    out = os.path.join(tmp_path, "pred.npy")
    evaluate.infer(cfg, checkpoint_path=path, input_path=inp, output_path=out)
    np.testing.assert_allclose(np.load(out), want, rtol=1e-5, atol=1e-6)
