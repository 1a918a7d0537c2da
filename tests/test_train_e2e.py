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


def test_sync_every_is_observationally_equivalent():
    """Deferred metric readback (sync_every=0) must not change training:
    same final params and same per-epoch losses as per-epoch sync."""
    import jax

    cfg = _tiny(configs.BURGERS, grid=(64,), latent_grid=(16,), batch_size=8)
    kw = dict(epochs=3, ntrain=32, ntest=16, verbose=False)
    _, s1, h1 = runner.train(cfg, **kw)
    _, s2, h2 = runner.train(cfg, sync_every=0, **kw)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for r1, r2 in zip(h1, h2):
        assert r1["epoch"] == r2["epoch"]
        np.testing.assert_allclose(r1["train_loss"], r2["train_loss"], rtol=1e-6)
        np.testing.assert_allclose(r1["rel_l2"], r2["rel_l2"], rtol=1e-6)


def test_naca_e2e_latent_slice_geometry():
    """Torch-family NACA: per-sample C-grid meshes with the latent cloud cut
    as a strided slice of the output mesh (reference: train_naca.py:62-95).
    Trains end to end on synthetic data; in-step top-k geometry engaged."""
    cfg = _tiny(
        configs.NACA, grid=(21, 11), latent_grid=(5, 3), batch_size=4
    )
    problem, state, history = _run(cfg, epochs=2, ntrain=16, ntest=8)
    # the latent slice really is (5*3) points: geometry dist_down rows
    batch = {
        k: v[: cfg.batch_size] for k, v in problem.train_data.items()
    }
    geom = problem.task.geom_fn(batch)
    assert geom.dist_down is None  # lazy: fused/in-step geometry
    assert geom.mesh_ltt.shape[1] == 15  # L_ltt = 5*3
    assert geom.mesh_out.shape[1] == 21 * 11  # L_out = C-grid size


def test_vorticity_rollout_history_has_stepwise_metrics():
    """Rollout-benchmark training history reports stepwise rel-L2, not just
    the loss (reference prints test error each epoch:
    train_vorticity.py:130-146)."""
    cfg = _tiny(
        configs.VORTICITY,
        grid=(16, 16), latent_grid=(8, 8),
        rollout_steps=3, memory=4, batch_size=8,
    )
    _, _, history = _run(cfg, epochs=2, ntrain=16, ntest=8)
    row = history[-1]
    assert {"rel_l2_step", "rel_l2_final"} <= set(row)
    assert np.isfinite([row["rel_l2_step"], row["rel_l2_final"]]).all()


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


def test_vorticity_tf_trajectory_loss_semantics():
    """vorticity_tf trains on ONE rel_norm_step objective over the whole
    unrolled trajectory — mean over (batch, steps) of stepwise rel-L2
    (reference: tensorflow/4_Vorticity/train.py:40, utils.py:11-21) — not
    the torch-style per-step summed loss."""
    import jax
    import jax.numpy as jnp

    from position_induced_transformer_tpu.ops.metrics import rel_norm_step
    from position_induced_transformer_tpu.train import benchmarks

    cfg = _tiny(
        configs.VORTICITY_TF,
        grid=(16, 16), latent_grid=(8, 8),
        rollout_steps=3, memory=4, batch_size=8,
    )
    assert cfg.trajectory_loss
    problem = benchmarks.setup(cfg, ntrain=8, ntest=8)
    params = problem.init_fn(
        jax.random.PRNGKey(0),
        jax.tree_util.tree_map(lambda a: a[:2], problem.train_data),
    )["params"]
    batch = jax.tree_util.tree_map(lambda a: a[:8], problem.train_data)
    loss = problem.task.loss_fn(params, problem.geom, batch)
    pred = problem.task.rollout_preds(params, problem.geom, batch)
    expected = jnp.mean(rel_norm_step(batch["y"], pred))
    np.testing.assert_allclose(float(loss), float(expected), rtol=1e-6)


def test_naca_tf_nonneg_bandwidth_projection():
    """The keras NonNeg constraint projects the tan-bandwidth parameter r
    onto [0, inf) after every optimizer update (reference:
    tensorflow/6_NACA/utils.py:115) — stored params must end non-negative,
    while the bandwidth function itself is plain tan(r) (full gradient)."""
    import jax

    from position_induced_transformer_tpu.models.pit_tf import _bandwidth

    # plain tan: negative r has a real (pass-through) gradient
    g = jax.grad(lambda r: _bandwidth(r, "tan"))(-0.3)
    assert abs(float(g) - 1.0 / np.cos(0.3) ** 2) < 1e-5

    cfg = _tiny(
        configs.NACA_TF, grid=(21, 11), latent_grid=(11, 6), batch_size=4
    )
    problem, state, _ = _run(cfg, epochs=2, ntrain=16, ntest=8)
    bands = [
        np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]
        if any(getattr(k, "key", None) == "band_width" for k in path)
    ]
    assert bands, "no band_width parameters found"
    assert all((b >= 0).all() for b in bands)


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


def test_eval_covers_nondivisible_ntest():
    """Evaluation must cover EVERY test sample for any batch size (the
    reference's test loader keeps the remainder — train_burgers.py:96-106;
    keras validation_data). ntest=13 with eval batch 8 pads the tail batch
    and masks the duplicates, so history metrics equal a direct full-set
    computation; predict() likewise returns all 13 rows."""
    from position_induced_transformer_tpu.ops.metrics import (
        rel_lp_norm,
        rel_max_norm,
    )

    cfg = _tiny(configs.BURGERS, grid=(64,), latent_grid=(16,), batch_size=8)
    problem, state, history = runner.train(
        cfg, epochs=1, ntrain=16, ntest=13, verbose=False
    )
    pred = runner.predict(problem, state)
    assert pred.shape[0] == 13
    true = np.asarray(problem.test_data["y"])
    row = history[-1]
    np.testing.assert_allclose(
        row["rel_l2"], float(rel_lp_norm(true, pred, 1, 2)) / 13, rtol=1e-5
    )
    np.testing.assert_allclose(
        row["rel_l1"], float(rel_lp_norm(true, pred, 1, 1)) / 13, rtol=1e-5
    )
    np.testing.assert_allclose(
        row["rel_max"], float(rel_max_norm(true, pred, 1)) / 13, rtol=1e-5
    )


def test_batch_mean_loss_weighted_denominator():
    """Task._loss with padding weights must divide by the VALID-sample
    count, not the padded batch size: the masked padded tail batch of a
    batch-mean-loss (TF-family) eval equals the loss computed over just
    the valid samples."""
    import jax.numpy as jnp

    from position_induced_transformer_tpu.train.loop import Task

    rng = np.random.RandomState(0)
    true = np.asarray(rng.randn(8, 16, 1), np.float32)
    pred = np.asarray(rng.randn(8, 16, 1), np.float32)
    # padded batch: 5 valid samples + 3 repeats of the last one, masked
    true_p = np.concatenate([true[:5], np.repeat(true[4:5], 3, axis=0)])
    pred_p = np.concatenate([pred[:5], np.repeat(pred[4:5], 3, axis=0)])
    w = jnp.asarray([1, 1, 1, 1, 1, 0, 0, 0], jnp.float32)
    task = Task(model=None, batch_mean_loss=True)
    got = float(task._loss(jnp.asarray(true_p), jnp.asarray(pred_p), weights=w))
    want = float(task._loss(jnp.asarray(true[:5]), jnp.asarray(pred[:5])))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_eval_permutation_pads_remainder():
    from position_induced_transformer_tpu.train.loop import eval_permutation

    perm = np.asarray(eval_permutation(13, 8))
    assert perm.shape == (2, 8)
    np.testing.assert_array_equal(perm.ravel()[:13], np.arange(13))
    np.testing.assert_array_equal(perm.ravel()[13:], [12, 12, 12])
    # exactly divisible: unchanged shape, no padding
    perm = np.asarray(eval_permutation(16, 8))
    assert perm.shape == (2, 8)
    np.testing.assert_array_equal(perm.ravel(), np.arange(16))


def test_eval_epoch_default_masks_padding():
    """make_eval_epoch called WITHOUT n_valid (the pre-padding 4-arg
    contract, still used by scripts) must not double-count the padded tail
    duplicates: the default derives the valid count from the dataset
    size, so metric sums equal the explicit n_valid=n call."""
    from position_induced_transformer_tpu.train.loop import (
        eval_permutation,
        make_eval_epoch,
    )

    cfg = _tiny(configs.BURGERS, grid=(64,), latent_grid=(16,), batch_size=8)
    problem, state, _ = runner.train(
        cfg, epochs=1, ntrain=16, ntest=13, verbose=False
    )
    eval_epoch = make_eval_epoch(problem.task)
    perm = eval_permutation(13, 8)
    default = eval_epoch(state, problem.geom, problem.test_data, perm)
    explicit = eval_epoch(state, problem.geom, problem.test_data, perm, 13)
    for k in explicit:
        np.testing.assert_allclose(
            float(default[k]), float(explicit[k]), rtol=1e-6
        )


def test_rollout_eval_covers_nondivisible_ntest():
    """Rollout-family eval metrics also cover the full test set when the
    batch size does not divide ntest."""
    cfg = _tiny(
        configs.VORTICITY,
        grid=(16, 16), latent_grid=(8, 8),
        rollout_steps=3, memory=4, batch_size=8,
    )
    problem, state, history = runner.train(
        cfg, epochs=1, ntrain=16, ntest=11, verbose=False
    )
    import jax

    pred = np.asarray(
        jax.jit(problem.task.rollout_preds)(
            state.params, problem.geom, problem.test_data
        )
    )
    rel = np.asarray(
        problem.task.stepwise_rel(problem.test_data["y"], pred)
    )  # (11, steps)
    row = history[-1]
    np.testing.assert_allclose(
        row["rel_l2_step"], rel.mean(axis=-1).sum() / 11, rtol=1e-5
    )
    np.testing.assert_allclose(
        row["rel_l2_final"], rel[:, -1].sum() / 11, rtol=1e-5
    )


def test_model_variant_lite_e2e():
    """`--model-variant lite`: self-attention processor inside the
    position-attention encoder/decoder (reference LiteTransformer,
    tensorflow/1_InviscidBurgers/utils.py:285-353, enabled by swapping one
    constructor line in train.py:38-40). Trains end to end; the processor
    blocks carry Q/K/V params instead of band_width."""
    cfg = _tiny(
        configs.BURGERS_TF, grid=(64,), latent_grid=(32,), batch_size=8,
        model_variant="lite",
    )
    problem, state, _ = _run(cfg)
    assert {"query", "key", "value"} <= set(state.params["MHPA_0"])
    assert "band_width" in state.params["down"]  # coders stay positional


def test_model_variant_transformer_e2e():
    """`--model-variant transformer`: all attention dot-product, hence no
    latent downsampling (reference Transformer,
    tensorflow/1_InviscidBurgers/utils.py:355-416)."""
    cfg = _tiny(
        configs.BURGERS_TF, grid=(64,), latent_grid=(32,), batch_size=8,
        model_variant="transformer",
    )
    problem, state, _ = _run(cfg)
    assert {"query", "key", "value"} <= set(state.params["down"])


def test_model_variant_selfpit_e2e():
    """`--model-variant selfpit`: hybrid QK^T/sqrt(d) - tan(r)*D attention
    everywhere (reference SelfPiT,
    tensorflow/1_InviscidBurgers/utils.py:483-553); requires latent ==
    query resolution like the reference dir."""
    cfg = _tiny(
        configs.BURGERS_TF, grid=(64,), latent_grid=(64,), batch_size=8,
        model_variant="selfpit",
    )
    problem, state, _ = _run(cfg)
    assert {"query", "key", "weight", "band_width"} <= set(
        state.params["down"]
    )


def test_model_variant_lite_darcy_tf():
    """Variant routing through a no-up2 2-D benchmark (reference
    3_Darcy2D/utils.py:319-389 LiteTransformer mirrors its PiT: no decoder
    self-attention, in-call denormalization)."""
    cfg = _tiny(
        configs.DARCY_TF, grid=(22, 22), latent_grid=(8, 8), batch_size=8,
        model_variant="lite",
    )
    _run(cfg, setup_kwargs={"downsampling": 20})


def test_model_variant_point_cloud_lite_and_transformer():
    """Point-cloud family variants (reference 5_Elasticity/utils.py:244-382)."""
    for variant in ("lite", "transformer"):
        cfg = _tiny(
            configs.ELASTICITY_TF, batch_size=4, model_variant=variant
        )
        _run(cfg, epochs=2, ntrain=8, ntest=4)


def test_model_variant_errors():
    """Clear errors: torch-family benchmarks have no baselines; selfpit
    needs latent == query; point clouds have no selfpit."""
    import pytest

    from position_induced_transformer_tpu.train import benchmarks

    cfg = _tiny(configs.BURGERS, grid=(64,), latent_grid=(16,),
                model_variant="lite")
    with pytest.raises(ValueError, match="TF-family"):
        benchmarks.setup(cfg, ntrain=8, ntest=8)
    cfg = _tiny(configs.BURGERS_TF, grid=(64,), latent_grid=(32,),
                model_variant="selfpit")
    with pytest.raises(ValueError, match="latent == query"):
        benchmarks.setup(cfg, ntrain=8, ntest=8)
    cfg = _tiny(configs.ELASTICITY_TF, model_variant="selfpit")
    with pytest.raises(ValueError, match="point-cloud"):
        benchmarks.setup(cfg, ntrain=8, ntest=8)


def _trees_close(a, b, atol=2e-5, rtol=2e-4):
    import jax

    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=atol, rtol=rtol
        )


def test_grad_accum_matches_full_batch():
    """--grad-accum K is the same optimization trajectory as the full
    batch: batch-summed losses/gradients add exactly across microbatches
    (only fp reassociation differs)."""
    cfg = _tiny(configs.BURGERS, grid=(64,), latent_grid=(16,), batch_size=8)
    kw = dict(epochs=2, ntrain=16, ntest=8, verbose=False)
    _, s1, h1 = runner.train(cfg, **kw)
    _, s2, h2 = runner.train(cfg, grad_accum=4, **kw)
    _trees_close(s1.params, s2.params)
    for r1, r2 in zip(h1, h2):
        np.testing.assert_allclose(
            r1["train_loss"], r2["train_loss"], rtol=1e-4
        )
        np.testing.assert_allclose(r1["rel_l2"], r2["rel_l2"], rtol=1e-3)


def test_grad_accum_matches_full_batch_batch_mean_loss():
    """TF-family (batch-mean loss) convention: the accumulated loss and
    gradients are averaged over microbatches, matching the full-batch
    mean exactly (equal microbatch sizes)."""
    cfg = _tiny(
        configs.BURGERS_TF, grid=(64,), latent_grid=(32,), batch_size=8
    )
    kw = dict(epochs=2, ntrain=16, ntest=8, verbose=False)
    _, s1, h1 = runner.train(cfg, **kw)
    _, s2, h2 = runner.train(cfg, grad_accum=2, **kw)
    _trees_close(s1.params, s2.params)
    for r1, r2 in zip(h1, h2):
        np.testing.assert_allclose(
            r1["train_loss"], r2["train_loss"], rtol=1e-4
        )


def test_grad_accum_rollout_bptt():
    """Accumulation composes with 20-step-style BPTT rollout training
    (each microbatch runs its own rollout scan under remat)."""
    cfg = _tiny(
        configs.VORTICITY,
        grid=(16, 16), latent_grid=(8, 8),
        rollout_steps=3, memory=4, batch_size=8,
    )
    kw = dict(epochs=1, ntrain=16, ntest=8, verbose=False)
    _, s1, h1 = runner.train(cfg, **kw)
    _, s2, h2 = runner.train(cfg, grad_accum=2, **kw)
    _trees_close(s1.params, s2.params)


def test_grad_accum_indivisible_errors():
    import pytest

    cfg = _tiny(configs.BURGERS, grid=(64,), latent_grid=(16,), batch_size=8)
    with pytest.raises(ValueError, match="not divisible"):
        runner.train(
            cfg, epochs=1, ntrain=16, ntest=8, verbose=False, grad_accum=3
        )


def test_grad_accum_nonpositive_errors():
    """grad_accum < 1 raises a clear ValueError in the runner (not a
    ZeroDivisionError from the fwd_bs computation)."""
    import pytest

    cfg = _tiny(configs.BURGERS, grid=(64,), latent_grid=(16,), batch_size=8)
    for bad in (0, -2):
        with pytest.raises(ValueError, match="grad_accum must be >= 1"):
            runner.train(
                cfg, epochs=1, ntrain=16, ntest=8, verbose=False,
                grad_accum=bad,
            )


def test_bf16_compute_dtype_trains_and_tracks_f32():
    """model.compute_dtype=bfloat16 (mixed precision): bf16 activations,
    f32 params/masks/softmax/output. Same config trains end-to-end and the
    trajectory tracks the f32 run loosely (bf16 rounding compounds over
    steps; the A/B acceptance for production use is measured on TPU —
    BASELINE.md)."""
    import dataclasses as dc

    cfg = _tiny(configs.BURGERS, grid=(64,), latent_grid=(16,), batch_size=8)
    cfg16 = dc.replace(
        cfg, model=dc.replace(cfg.model, compute_dtype="bfloat16")
    )
    kw = dict(epochs=3, ntrain=32, ntest=16, verbose=False)
    _, s1, h1 = runner.train(cfg, **kw)
    _, s2, h2 = runner.train(cfg16, **kw)
    # params stay f32 master weights
    import jax

    for leaf in jax.tree_util.tree_leaves(s2.params):
        assert leaf.dtype == np.float32
    assert h2[-1]["train_loss"] < h2[0]["train_loss"]
    np.testing.assert_allclose(
        h2[-1]["train_loss"], h1[-1]["train_loss"], rtol=0.1
    )


def test_bf16_forward_close_to_f32_and_f32_boundary():
    """One forward under shared weights: bf16 activations stay within a
    few % relative of the f32 forward (bf16's 2^-8 step compounds across
    ~2 attention + MLP layers; measured 3.0% on this config), and the
    model's OUTPUT is f32 (the loop's losses/normalizers/rollout feedback
    see no dtype change). Training-accuracy acceptance is the TPU
    full-budget A/B in BASELINE.md, not this unit bound."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from position_induced_transformer_tpu.train import benchmarks

    cfg = _tiny(
        configs.VORTICITY,
        grid=(16, 16), latent_grid=(8, 8),
        rollout_steps=2, memory=4, batch_size=4,
    )
    problem = benchmarks.setup(cfg, ntrain=8, ntest=4)
    params = problem.model.init(
        jax.random.PRNGKey(0), problem.geom, problem.train_data["x"][:4]
    )["params"]
    model16 = dc.replace(problem.model, compute_dtype="bfloat16")
    x = problem.train_data["x"][:4]
    out32 = problem.model.apply({"params": params}, problem.geom, x)
    out16 = model16.apply({"params": params}, problem.geom, x)
    assert out16.dtype == jnp.float32
    denom = np.linalg.norm(np.asarray(out32))
    assert np.linalg.norm(np.asarray(out16 - out32)) / denom < 5e-2


def test_bf16_tf_family_trains_and_tracks_f32():
    """TF-semantics family under compute_dtype=bfloat16 (PiTTF + the
    point-cloud model): trains end-to-end, params stay f32, trajectory
    tracks the f32 run loosely."""
    import dataclasses as dc

    import jax

    for base, kw in (
        (
            _tiny(configs.BURGERS_TF, grid=(64,), latent_grid=(32,),
                  batch_size=8),
            dict(epochs=3, ntrain=16, ntest=8, verbose=False),
        ),
        (
            _tiny(configs.ELASTICITY_TF, batch_size=4),
            dict(epochs=2, ntrain=8, ntest=8, verbose=False),
        ),
    ):
        cfg16 = dc.replace(
            base, model=dc.replace(base.model, compute_dtype="bfloat16")
        )
        _, s1, h1 = runner.train(base, **kw)
        _, s2, h2 = runner.train(cfg16, **kw)
        for leaf in jax.tree_util.tree_leaves(s2.params):
            assert leaf.dtype == np.float32
        assert np.isfinite(h2[-1]["train_loss"])
        np.testing.assert_allclose(
            h2[-1]["train_loss"], h1[-1]["train_loss"], rtol=0.15
        )


def test_lr_warmup_schedule_and_training():
    """warmup_steps: 0 = the reference cosine exactly; K = linear ramp to
    lr at step K then cosine over the remaining steps (opt-in stabilizer,
    configs.BenchmarkConfig.warmup_steps)."""
    import dataclasses

    import numpy as np

    from position_induced_transformer_tpu import configs
    from position_induced_transformer_tpu.train import runner
    from position_induced_transformer_tpu.train.loop import make_lr_schedule

    lr, total = 1e-3, 100
    plain = make_lr_schedule(lr, total)
    warm = make_lr_schedule(lr, total, warmup_steps=10)
    assert float(warm(0)) == 0.0
    assert abs(float(warm(5)) - 0.5 * lr) < 1e-9
    assert abs(float(warm(10)) - lr) < 1e-9
    # after warmup: the cosine over the remaining 90 steps
    assert float(warm(55)) < lr and float(warm(99)) < float(warm(55))
    # warmup=0 is the reference schedule bit-exactly
    for t in (0, 1, 50, 99):
        assert float(make_lr_schedule(lr, total, warmup_steps=0)(t)) == float(
            plain(t)
        )
    # end to end through the runner via the config field
    cfg = dataclasses.replace(configs.BURGERS, warmup_steps=4)
    _, _, hist = runner.train(
        cfg, epochs=2, ntrain=16, ntest=8, verbose=False
    )
    assert np.isfinite(hist[-1]["train_loss"])
