"""Evaluation flows: rollout metrics (vorticity/cylinder) via checkpoints."""

import dataclasses
import os

import numpy as np

from position_induced_transformer_tpu import configs
from position_induced_transformer_tpu.train import benchmarks, evaluate, runner


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


def test_infer_zssr_resolution(tmp_path):
    """Deployment inference at a FINER resolution than training: the
    checkpoint's training-resolution normalizer statistics bilinearly
    resize on apply, so a grid-shaped raw batch at the ZSSR resolution
    must work (previously _prepare_inputs rejected any resolution other
    than the stats grid) and match predict() on the ZSSR problem."""
    import jax.numpy as jnp

    cfg = dataclasses.replace(
        configs.DARCY,
        model=dataclasses.replace(configs.DARCY.model, hid_dim=16, n_blocks=2),
        latent_grid=(8, 8), batch_size=4,
    )
    path = os.path.join(tmp_path, "ckpt")
    problem, state, _ = runner.train(
        cfg, epochs=1, ntrain=8, ntest=4, verbose=False, checkpoint_path=path,
        setup_kwargs={"downsampling": 42},  # train at 11^2
    )
    # the ZSSR problem at 21^2 with the checkpoint's 11^2 statistics
    zssr_problem = benchmarks.setup(
        cfg, None, ntrain=4, ntest=4, downsampling=21,
        normalizers=(problem.x_normalizer, problem.y_normalizer),
    )
    s2 = zssr_problem.extras["s"]
    x_norm_flat = np.asarray(zssr_problem.test_data["x"])
    raw = np.asarray(
        problem.x_normalizer.denormalize(
            jnp.asarray(x_norm_flat.reshape(-1, s2, s2, 1))
        )
    )
    inp = os.path.join(tmp_path, "inp21.npy")
    np.save(inp, raw)
    res = evaluate.infer(
        cfg, checkpoint_path=path, input_path=inp,
        output_path=os.path.join(tmp_path, "pred21.npy"),
        setup_kwargs={"downsampling": 21},
    )
    pred = np.load(os.path.join(tmp_path, "pred21.npy"))
    want = runner.predict(zssr_problem, state)
    assert pred.shape == (4, s2, s2, 1)
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


def test_infer_per_sample_mesh_elasticity(tmp_path):
    """infer() on a per-sample-geometry benchmark: the coordinate
    variables geom_fn requires (here ``mesh``) come from the .mat input
    under the training batch names, while precomputed ``thr_*`` keys are
    optional. A bare .npy (which cannot carry the mesh) and a .mat
    missing it fail with clear errors."""
    import pytest
    from scipy.io import savemat

    cfg = dataclasses.replace(
        configs.ELASTICITY, batch_size=4,
        model=dataclasses.replace(
            configs.ELASTICITY.model, hid_dim=16, n_blocks=2
        ),
    )
    path = os.path.join(tmp_path, "ckpt")
    problem, state, _ = runner.train(
        cfg, epochs=1, ntrain=8, ntest=4, verbose=False,
        checkpoint_path=path, setup_kwargs={"n_points": 48},
    )
    x = np.asarray(problem.test_data["x"])[:3]
    mesh = np.asarray(problem.test_data["mesh"])[:3]
    inp = os.path.join(tmp_path, "inp.mat")
    savemat(inp, {"x": x, "mesh": mesh})
    out = os.path.join(tmp_path, "pred.npy")
    res = evaluate.infer(
        cfg, checkpoint_path=path, input_path=inp, output_path=out,
        setup_kwargs={"n_points": 48},
    )
    assert res["n"] == 3
    want = runner.predict(
        problem, state,
        data={
            "x": problem.test_data["x"][:3],
            "mesh": problem.test_data["mesh"][:3],
        },
    )
    np.testing.assert_allclose(np.load(out), want, rtol=1e-5, atol=1e-6)

    bare = os.path.join(tmp_path, "x.npy")
    np.save(bare, x)
    with pytest.raises(ValueError, match="mesh"):
        evaluate.infer(
            cfg, checkpoint_path=path, input_path=bare,
            setup_kwargs={"n_points": 48},
        )
    nomesh = os.path.join(tmp_path, "nomesh.mat")
    savemat(nomesh, {"x": x})
    with pytest.raises(ValueError, match="missing required variable"):
        evaluate.infer(
            cfg, checkpoint_path=path, input_path=nomesh,
            setup_kwargs={"n_points": 48},
        )


def test_infer_elasticity_tf_without_thresholds(tmp_path):
    """TF point-cloud infer() from a bare .npy: geom_fn never indexes the
    ``mesh`` extra (plot-only) so it is not demanded, and the absent
    precomputed thr_en/thr_de fall back to the identical in-op percentile
    computation — predictions match predict() on the benchmark's own
    batch (which carries the setup-time thresholds)."""
    cfg = dataclasses.replace(
        configs.ELASTICITY_TF, batch_size=4,
        model=dataclasses.replace(
            configs.ELASTICITY_TF.model, hid_dim=16, n_blocks=2
        ),
    )
    path = os.path.join(tmp_path, "ckpt")
    problem, state, _ = runner.train(
        cfg, epochs=1, ntrain=8, ntest=4, verbose=False,
        checkpoint_path=path, setup_kwargs={"n_points": 48},
    )
    x = np.asarray(problem.test_data["x"])[:3]
    inp = os.path.join(tmp_path, "inp.npy")
    np.save(inp, x)
    out = os.path.join(tmp_path, "pred.npy")
    res = evaluate.infer(
        cfg, checkpoint_path=path, input_path=inp, output_path=out,
        setup_kwargs={"n_points": 48},
    )
    assert res["n"] == 3
    sub = {k: v[:3] for k, v in problem.test_data.items() if k != "y"}
    want = runner.predict(problem, state, data=sub)
    np.testing.assert_allclose(np.load(out), want, rtol=1e-5, atol=1e-6)


def test_infer_h5_native_layout(tmp_path):
    """.h5 input batches written with plain h5py load in NATIVE row-major
    layout (no MATLAB-convention transpose) — a (n, L, C) batch
    round-trips unchanged and infer() matches predict()."""
    import h5py

    cfg = dataclasses.replace(
        configs.BURGERS,
        grid=(64,), latent_grid=(16,), batch_size=8,
        model=dataclasses.replace(configs.BURGERS.model, hid_dim=16, n_blocks=2),
    )
    path = os.path.join(tmp_path, "ckpt")
    problem, state, _ = runner.train(
        cfg, epochs=1, ntrain=16, ntest=8, verbose=False, checkpoint_path=path
    )
    x = np.asarray(problem.test_data["x"])[:3]  # (3, 64, 1): transpose-fragile
    inp = os.path.join(tmp_path, "inp.h5")
    with h5py.File(inp, "w") as f:
        f["x"] = x
    out = os.path.join(tmp_path, "pred.npy")
    res = evaluate.infer(
        cfg, checkpoint_path=path, input_path=inp, output_path=out
    )
    assert res["n"] == 3
    want = runner.predict(problem, state, data={"x": problem.test_data["x"][:3]})
    np.testing.assert_allclose(np.load(out), want, rtol=1e-5, atol=1e-6)


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


def test_predictor_host_setup_parity(tmp_path, monkeypatch):
    """Serving startup builds its problem under
    benchmarks.host_setup_context() and uploads once via commit_problem
    (zero accelerator round-trips during setup — the degraded-relay
    hazard in CLAUDE.md). On the CPU test backend the context is a no-op,
    so force the non-cpu branch and check nothing changes: identical
    predictions through a darcy Predictor (normalizer stats restored from
    the checkpoint — the riskiest committed-device interplay)."""
    import jax

    from position_induced_transformer_tpu.train import benchmarks

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
    data = {"x": np.asarray(problem.test_data["x"])[:3]}
    base = evaluate.Predictor(
        cfg, path, setup_kwargs={"downsampling": 30}
    ).predict_array(data)

    # Non-cpu branch: host context engages (still CPU devices here) and
    # commit_problem device_puts the pytrees explicitly.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    forced = evaluate.Predictor(
        cfg, path, setup_kwargs={"downsampling": 30}
    ).predict_array(data)
    monkeypatch.undo()
    np.testing.assert_array_equal(np.asarray(forced), np.asarray(base))

    # the context object itself: non-cpu -> a default_device manager,
    # cpu -> nullcontext
    import contextlib

    assert isinstance(
        benchmarks.host_setup_context(), contextlib.nullcontext
    )


def test_predictor_mesh_fixed_geometry_placement(tmp_path, monkeypatch):
    """Predictor with a data mesh on a FIXED-geometry benchmark: params,
    geometry and warmup data must share the mesh placement (review
    finding: a single-device commit_problem geometry meeting
    mesh-replicated params crashed the first jit with 'incompatible
    devices' on non-cpu backends). Forcing the non-cpu commit branch
    reproduces the clash on CPU if placement ever regresses."""
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
    data = {"x": np.asarray(problem.test_data["x"])[:3]}
    base = evaluate.Predictor(cfg, path).predict_array(data)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = evaluate.Predictor(cfg, path, mesh="data=2").predict_array(data)
    monkeypatch.undo()
    np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-6)


def test_predictor_darcy_without_stored_normalizers_refits_full_split(
    tmp_path,
):
    """A darcy checkpoint carrying ONLY params (what `convert
    --from-torch` writes) must refit normalizer statistics on the FULL
    training split, matching evaluate()'s convention — refitting on the
    Predictor's minimal split would silently denormalize with garbage
    statistics (review finding)."""
    cfg = dataclasses.replace(
        configs.DARCY,
        ntrain=16,  # the "full split" the stats must come from
        model=dataclasses.replace(configs.DARCY.model, hid_dim=16, n_blocks=2),
        latent_grid=(8, 8), batch_size=4,
    )
    path = os.path.join(tmp_path, "ckpt")
    problem, state, _ = runner.train(
        cfg, epochs=1, ntrain=16, ntest=4, verbose=False, checkpoint_path=path,
        setup_kwargs={"downsampling": 30},
    )
    # params-only checkpoint (no x/y_normalizer entries)
    from position_induced_transformer_tpu.train import checkpoint as ckpt

    stripped = os.path.join(tmp_path, "params_only")
    ckpt.save(stripped, {"params": state.params})

    pred = evaluate.Predictor(
        cfg, stripped, setup_kwargs={"downsampling": 30}
    )
    np.testing.assert_allclose(
        np.asarray(pred.problem.x_normalizer.mean),
        np.asarray(problem.x_normalizer.mean),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(pred.problem.y_normalizer.std),
        np.asarray(problem.y_normalizer.std),
        rtol=1e-6,
    )


def test_predictor_single_sample_request_pads_to_serving_batch(tmp_path):
    """predict_array pads a 1-sample request up to the serving batch size
    (one warmed executable for every request size) and still returns
    exactly the one prediction."""
    cfg = dataclasses.replace(
        configs.BURGERS,
        grid=(64,), latent_grid=(16,), batch_size=8,
        model=dataclasses.replace(configs.BURGERS.model, hid_dim=16, n_blocks=2),
    )
    path = os.path.join(tmp_path, "ckpt")
    problem, state, _ = runner.train(
        cfg, epochs=1, ntrain=16, ntest=8, verbose=False, checkpoint_path=path
    )
    p = evaluate.Predictor(cfg, path)
    x8 = np.asarray(problem.test_data["x"])[:8]
    full = p.predict_array({"x": x8})
    one = p.predict_array({"x": x8[:1]})
    assert one.shape[0] == 1
    np.testing.assert_allclose(one[0], full[0], rtol=1e-6)
    assert p._batch_size(None) == 8  # padded up, not shrunk


def test_evaluate_f32_checkpoint_at_bf16():
    """Deployment mixed precision: a checkpoint trained at the f32
    default evaluates under model.compute_dtype=bfloat16 (params are
    dtype-independent f32 master weights) with metrics close to the f32
    evaluation — the CLI form is
    `evaluate --set model.compute_dtype=bfloat16`."""
    import dataclasses
    import tempfile

    from position_induced_transformer_tpu import configs
    from position_induced_transformer_tpu.train import evaluate, runner

    cfg = configs.BURGERS
    cfg = dataclasses.replace(
        cfg,
        grid=(64,), latent_grid=(16,), batch_size=8,
        model=dataclasses.replace(cfg.model, hid_dim=16, n_blocks=2),
    )
    with tempfile.TemporaryDirectory() as d:
        ckpt_path = d + "/ckpt"
        runner.train(
            cfg, epochs=2, ntrain=16, ntest=8, verbose=False,
            checkpoint_path=ckpt_path,
        )
        r32 = evaluate.evaluate(cfg, checkpoint_path=ckpt_path, ntest=8)
        cfg16 = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, compute_dtype="bfloat16"
            )
        )
        r16 = evaluate.evaluate(cfg16, checkpoint_path=ckpt_path, ntest=8)
    np.testing.assert_allclose(r16["rel_l2"], r32["rel_l2"], rtol=2e-2)


def _tiny(cfg, **kw):
    model = dataclasses.replace(cfg.model, hid_dim=16, n_blocks=2)
    return dataclasses.replace(cfg, model=model, **kw)


def test_evaluate_shuffle_ablation_naca(tmp_path):
    """`evaluate --shuffle-ablation` on the torch NACA benchmark: the
    encoder input is also the source cloud, so the shuffled pairing
    recomputes the encoder thresholds; true_relL2 must agree with the
    headline rel_l2 (same per-sample-mean convention, reused predictions)."""
    cfg = _tiny(configs.NACA, grid=(21, 11), latent_grid=(5, 3), batch_size=4)
    path = os.path.join(tmp_path, "ckpt")
    runner.train(
        cfg, epochs=2, ntrain=16, ntest=8, verbose=False, checkpoint_path=path
    )
    res = evaluate.evaluate(
        cfg, checkpoint_path=path, ntest=8, shuffle_ablation=True
    )
    abl = res["shuffle_ablation"]
    assert set(abl) == {"true_relL2", "shuffled_inputs_relL2"}
    assert np.isfinite([abl["true_relL2"], abl["shuffled_inputs_relL2"]]).all()
    assert abl["true_relL2"] > 0 and abl["shuffled_inputs_relL2"] > 0
    np.testing.assert_allclose(abl["true_relL2"], res["rel_l2"], rtol=1e-3)


def test_input_shuffle_ablation_elasticity_keeps_coords(tmp_path):
    """Elasticity shuffles only the void-radius channels: the probe must
    perturb predictions (the model reads rvec generically even at random
    init) while the geometry stays aligned with the targets."""
    cfg = _tiny(configs.ELASTICITY, batch_size=4)
    problem, state, _ = runner.train(
        cfg, epochs=1, ntrain=8, ntest=8, verbose=False
    )
    abl = evaluate.input_shuffle_ablation(problem, state)
    assert np.isfinite([abl["true_relL2"], abl["shuffled_inputs_relL2"]]).all()
    assert abl["shuffled_inputs_relL2"] != abl["true_relL2"]


def test_shuffle_ablation_rejects_rollout_benchmarks(tmp_path):
    """In-graph-rollout benchmarks evaluate trajectory divergence, not the
    one-step operator map — the probe refuses them with a clear error."""
    import pytest

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
    with pytest.raises(ValueError, match="shuffle-ablation"):
        evaluate.evaluate(
            cfg, checkpoint_path=path, ntest=8, shuffle_ablation=True
        )


def test_shuffle_perm_is_a_derangement_cycle():
    """The ablation pairing must never map a sample to itself (identity
    pairs would dilute the probe) and must be a single cycle, so for
    trajectory-major layouts (cylinder) same-trajectory pairings are a
    rarity rather than the roll-by-1 rule; seeded for reproducibility."""
    for n in (2, 3, 10, 200, 1000):
        perm = evaluate._shuffle_perm(n)
        assert sorted(perm) == list(range(n))
        assert not np.any(perm == np.arange(n))
        # single n-cycle: following the pairing visits every sample
        seen, i = set(), 0
        for _ in range(n):
            i = perm[i]
            seen.add(int(i))
        assert len(seen) == n
    np.testing.assert_array_equal(
        evaluate._shuffle_perm(100), evaluate._shuffle_perm(100)
    )
