"""Multi-device tests on the 8-fake-CPU-device mesh (conftest.py).

Validates that the data/model/sequence shardings compile, execute, and are
numerically consistent with the single-device path.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from position_induced_transformer_tpu import configs
from position_induced_transformer_tpu.parallel import (
    make_mesh,
    replicate_tree,
    sequence_shard_geometry,
    shard_state,
)
from position_induced_transformer_tpu.train import (
    epoch_permutation,
    make_optimizer,
    make_train_epoch,
)
from position_induced_transformer_tpu.train import benchmarks, runner

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (fake) devices"
)


def _tiny_problem():
    cfg = configs.BURGERS
    cfg = dataclasses.replace(
        cfg,
        grid=(64,), latent_grid=(16,), batch_size=8,
        model=dataclasses.replace(cfg.model, hid_dim=16, n_blocks=2),
    )
    return cfg, benchmarks.setup(cfg, ntrain=32, ntest=8)


def test_mesh_axes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}


def test_dp_tp_epoch_matches_single_device():
    cfg, problem = _tiny_problem()
    optimizer = make_optimizer(cfg.lr, 16)
    state0 = runner.init_state(problem, optimizer, seed=0)
    perm = epoch_permutation(0, problem.n_train, cfg.batch_size)

    # single-device reference epoch
    single = make_train_epoch(problem.task, optimizer)
    s1, loss1 = single(state0, problem.geom, problem.train_data, perm)

    # 4x2 data x model mesh
    mesh = make_mesh(n_data=4, n_model=2)
    state0b = runner.init_state(problem, optimizer, seed=0)
    sharded_state = shard_state(mesh, state0b, n_head=cfg.model.n_head)
    geom = replicate_tree(mesh, problem.geom)
    data = replicate_tree(mesh, problem.train_data)
    parallel = make_train_epoch(problem.task, optimizer, mesh=mesh)
    s2, loss2 = parallel(sharded_state, geom, data, perm)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_sequence_sharded_decoder_matches():
    cfg, problem = _tiny_problem()
    optimizer = make_optimizer(cfg.lr, 16)
    state = runner.init_state(problem, optimizer, seed=0)
    x = problem.test_data["x"][:4]
    fwd = jax.jit(problem.model.apply)
    ref = fwd({"params": state.params}, problem.geom, x)

    mesh = make_mesh(n_data=8, n_model=1)
    geom_sp = sequence_shard_geometry(mesh, problem.geom)
    out = fwd({"params": state.params}, geom_sp, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_sequence_sharded_decoder_padded_rows():
    """SP decode with a query-row count NOT divisible by the axis (the real
    ZSSR case: 421^2 = 177,241 rows on 8 devices) — pad=True pads by
    repeating the last row; sliced output matches the unsharded forward."""
    cfg, problem = _tiny_problem()
    optimizer = make_optimizer(cfg.lr, 16)
    state = runner.init_state(problem, optimizer, seed=0)
    x = problem.test_data["x"][:4]
    fwd = jax.jit(problem.model.apply)
    ref = fwd({"params": state.params}, problem.geom, x)

    import dataclasses as _dc

    # make rows indivisible by 8: drop one decoder query row
    geom_odd = _dc.replace(
        problem.geom,
        dist_up=problem.geom.dist_up[:-1],
        thr_up=None if problem.geom.thr_up is None else problem.geom.thr_up[:-1],
    )
    n_rows = geom_odd.dist_up.shape[0]
    assert n_rows % 8 != 0

    mesh = make_mesh(n_data=8, n_model=1)
    geom_sp = sequence_shard_geometry(mesh, geom_odd, pad=True)
    out = fwd({"params": state.params}, geom_sp, x)[:, :n_rows]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref[:, :n_rows]), rtol=1e-5, atol=1e-6
    )


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_dryrun_multichip_4():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)


def test_shard_map_step_matches_single_device():
    """Explicit-collective shard_map DP step == single-device step."""
    import optax

    from position_induced_transformer_tpu.parallel.shard_map_step import (
        make_shard_map_train_step,
        shard_batch_arrays,
    )
    from position_induced_transformer_tpu.train.loop import TrainState

    cfg, problem = _tiny_problem()
    optimizer = make_optimizer(cfg.lr, 16)
    state0 = runner.init_state(problem, optimizer, seed=0)
    batch = jax.tree_util.tree_map(lambda a: a[:8], problem.train_data)

    # single device
    import jax.numpy as jnp2

    def single_step(state, geom, batch):
        loss, grads = jax.value_and_grad(problem.task.loss_fn)(
            state.params, geom, batch
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    s1, l1 = jax.jit(single_step)(state0, problem.geom, batch)

    mesh = make_mesh(n_data=8, n_model=1)
    step = make_shard_map_train_step(problem.task, optimizer, mesh)
    state0b = runner.init_state(problem, optimizer, seed=0)
    s2, l2 = step(
        state0b,
        replicate_tree(mesh, problem.geom),
        shard_batch_arrays(mesh, batch),
    )
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
        )

    # multi-slice mesh: the same step with the explicit two-level
    # reduction — psum over 'data' (intra-slice ICI), then over 'dcn'
    # (the one DCN-crossing all-reduce) — must still match
    mesh3 = make_mesh(n_data=2, n_model=1, n_dcn=2)
    step3 = make_shard_map_train_step(problem.task, optimizer, mesh3)
    state0c = runner.init_state(problem, optimizer, seed=0)
    s3, l3 = step3(
        state0c,
        replicate_tree(mesh3, problem.geom),
        shard_batch_arrays(mesh3, batch),
    )
    np.testing.assert_allclose(float(l1), float(l3), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s3.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
        )


def test_pipeline_processor_matches_single_device():
    """GPipe stage-split forward == plain forward (4 stages x 4 micro)."""
    from position_induced_transformer_tpu.parallel.pipeline import (
        make_pipelined_apply,
        make_stage_mesh,
    )

    cfg, problem = _tiny_problem()  # n_blocks=2 -> use 2 stages
    mesh = make_stage_mesh(2)
    model = problem.task.model
    params = runner.init_state(
        problem, make_optimizer(cfg.lr, 10), seed=0
    ).params
    x = jnp.asarray(np.asarray(problem.test_data["x"][:8]))

    want = model.apply({"params": params}, problem.geom, x)
    apply = make_pipelined_apply(model, mesh, n_micro=4)
    got = jax.jit(apply)(params, problem.geom, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-5
    )


def test_pipeline_four_stages():
    """4-stage pipeline on a 4-block processor, microbatches != stages."""
    from position_induced_transformer_tpu.parallel.pipeline import (
        make_pipelined_apply,
        make_stage_mesh,
    )

    cfg = configs.BURGERS
    cfg = dataclasses.replace(
        cfg,
        grid=(64,), latent_grid=(16,), batch_size=8,
        model=dataclasses.replace(cfg.model, hid_dim=16, n_blocks=4),
    )
    problem = benchmarks.setup(cfg, ntrain=16, ntest=8)
    mesh = make_stage_mesh(4)
    model = problem.task.model
    params = runner.init_state(
        problem, make_optimizer(cfg.lr, 10), seed=0
    ).params
    x = jnp.asarray(np.asarray(problem.test_data["x"][:8]))

    want = model.apply({"params": params}, problem.geom, x)
    apply = make_pipelined_apply(model, mesh, n_micro=2)
    got = jax.jit(apply)(params, problem.geom, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-5
    )


def test_pipeline_gradients_match_single_device():
    """jax.grad flows through the GPipe schedule (ppermute is
    differentiable): parameter gradients match the plain forward's."""
    from position_induced_transformer_tpu.parallel.pipeline import (
        make_pipelined_apply,
        make_stage_mesh,
    )

    cfg, problem = _tiny_problem()
    mesh = make_stage_mesh(2)
    model = problem.task.model
    params = runner.init_state(
        problem, make_optimizer(cfg.lr, 10), seed=0
    ).params
    x = jnp.asarray(np.asarray(problem.test_data["x"][:8]))
    y = jnp.asarray(np.asarray(problem.test_data["y"][:8]))

    def loss_plain(p):
        out = model.apply({"params": p}, problem.geom, x)
        return jnp.sum((out - y) ** 2)

    pp = make_pipelined_apply(model, mesh, n_micro=4)

    def loss_pp(p):
        return jnp.sum((pp(p, problem.geom, x) - y) ** 2)

    g_plain = jax.jit(jax.grad(loss_plain))(params)
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    flat_a, _ = jax.tree_util.tree_flatten(g_plain)
    flat_b, _ = jax.tree_util.tree_flatten(g_pp)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def test_shard_map_step_applies_param_constraint():
    """The explicit shard_map step honors keras-style post-update
    constraints, matching the single-device loop (train/loop.py)."""
    import dataclasses as _dc

    from position_induced_transformer_tpu.parallel.shard_map_step import (
        make_shard_map_train_step,
        shard_batch_arrays,
    )
    from position_induced_transformer_tpu.parallel import make_mesh

    # observable constraint: project every parameter to >= 0 (PiT biases
    # start negative, so this visibly changes the params iff applied)
    constrain = lambda params: jax.tree_util.tree_map(
        lambda a: jnp.maximum(a, 0.0), params
    )

    cfg, problem = _tiny_problem()
    task = _dc.replace(problem.task, param_constraint=constrain)
    optimizer = make_optimizer(cfg.lr, 16)
    state = runner.init_state(problem, optimizer, seed=0)
    mesh = make_mesh(n_data=4, n_model=1)
    step = make_shard_map_train_step(task, optimizer, mesh)
    batch = shard_batch_arrays(
        mesh, jax.tree_util.tree_map(lambda a: a[:8], problem.train_data)
    )
    state, loss = step(state, problem.geom, batch)
    assert jnp.isfinite(loss)
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert bool(jnp.all(leaf >= 0))


def test_pipeline_with_instance_norm_and_residual():
    """Pipelined apply mirrors PiT.__call__ for the vorticity-style
    (instance-norm) and cylinder-style (residual-output) variants."""
    from position_induced_transformer_tpu.models import PiT, build_geometry
    from position_induced_transformer_tpu.parallel.pipeline import (
        make_pipelined_apply,
        make_stage_mesh,
    )

    mesh1 = jnp.linspace(0, 1, 33)[:-1].reshape(-1, 1)
    ltt = jnp.linspace(0, 1, 9)[:-1].reshape(-1, 1)
    geom = build_geometry(
        mesh1, ltt, mesh1, metric="euclidean", en_loc=0.1, de_loc=0.1
    )
    for kwargs in (
        dict(use_instance_norm=True),
        dict(residual_output=True),
    ):
        model = PiT(
            space_dim=1, in_dim=1, out_dim=1, hid_dim=8, n_head=2,
            n_blocks=2, en_loc=0.1, de_loc=0.1, **kwargs,
        )
        x = jax.random.uniform(jax.random.PRNGKey(2), (4, 32, 1))
        params = model.init(jax.random.PRNGKey(0), geom, x)["params"]
        want = model.apply({"params": params}, geom, x)
        pp = make_pipelined_apply(model, make_stage_mesh(2), n_micro=2)
        got = jax.jit(pp)(params, geom, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-5
        )


def test_pipeline_training_epoch_matches_single_device():
    """A full training epoch through pipeline_task (loss + grads through
    the ppermute schedule + Adam) matches the plain epoch."""
    from position_induced_transformer_tpu.parallel.pipeline import (
        make_stage_mesh,
        pipeline_task,
    )

    cfg, problem = _tiny_problem()
    optimizer = make_optimizer(cfg.lr, 8)
    perm = epoch_permutation(0, problem.n_train, cfg.batch_size)

    state0 = runner.init_state(problem, optimizer, seed=0)
    plain = make_train_epoch(problem.task, optimizer)
    s_plain, loss_plain = plain(
        state0, problem.geom, problem.train_data, perm
    )

    state0 = runner.init_state(problem, optimizer, seed=0)
    pp = make_train_epoch(
        pipeline_task(problem.task, make_stage_mesh(2), n_micro=2), optimizer
    )
    s_pp, loss_pp = pp(state0, problem.geom, problem.train_data, perm)

    np.testing.assert_allclose(float(loss_pp), float(loss_plain), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_plain.params),
        jax.tree_util.tree_leaves(s_pp.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def test_parse_mesh_spec():
    from position_induced_transformer_tpu.parallel import parse_mesh_spec

    m = parse_mesh_spec("data=4,model=2")
    assert dict(m.shape) == {"data": 4, "model": 2}
    assert parse_mesh_spec(m) is m
    assert parse_mesh_spec(None) is None
    auto = parse_mesh_spec("auto")
    assert auto.shape["data"] == len(jax.devices())
    with pytest.raises(ValueError):
        parse_mesh_spec("data=x")
    stage = parse_mesh_spec("stage=2")
    assert dict(stage.shape) == {"stage": 2}
    with pytest.raises(ValueError, match="cannot be combined"):
        parse_mesh_spec("data=2,stage=2")
    with pytest.raises(ValueError):
        parse_mesh_spec(f"data={len(jax.devices()) * 2}")
    with pytest.raises(ValueError):
        parse_mesh_spec(f"stage={len(jax.devices()) * 2}")


def test_parse_mesh_spec_dcn():
    from position_induced_transformer_tpu.parallel.sharding import (
        data_axis_size,
        parse_mesh_spec,
    )

    m = parse_mesh_spec("dcn=2,data=2,model=2")
    assert dict(m.shape) == {"dcn": 2, "data": 2, "model": 2}
    assert data_axis_size(m) == 4
    assert data_axis_size(None) == 1
    assert data_axis_size(parse_mesh_spec("data=4")) == 4
    with pytest.raises(ValueError, match="cannot be combined"):
        parse_mesh_spec("dcn=2,stage=2")
    with pytest.raises(ValueError):
        parse_mesh_spec(f"dcn={len(jax.devices())},data=2")


def test_predict_mesh_standalone():
    """runner.predict(mesh=...) works on single-device state directly —
    it replicates params/geom/data itself (previously it crashed with
    'Received incompatible devices' unless the caller pre-replicated)."""
    cfg, problem = _tiny_problem()
    state = runner.init_state(problem, make_optimizer(cfg.lr, 4), seed=0)
    want = runner.predict(problem, state)
    mesh = make_mesh(n_data=4, n_model=1)
    got = runner.predict(problem, state, mesh=mesh)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_mesh_validation_errors():
    """Clear errors instead of opaque jax/numpy failures: duplicate axes,
    too few devices at make_mesh level, indivisible tensor-parallel
    widths, and sequence-sharding a lazy geometry."""
    from position_induced_transformer_tpu.parallel.sharding import (
        parse_mesh_spec,
        sequence_shard_geometry,
    )

    with pytest.raises(ValueError, match="duplicate mesh axis"):
        parse_mesh_spec("data=2,data=8")
    with pytest.raises(ValueError, match="devices"):
        make_mesh(n_data=len(jax.devices()) * 2, n_model=1)

    # hid_dim=16 not divisible by model=3: clear message, not an opaque
    # uneven-shard device_put error
    cfg, problem = _tiny_problem()
    state = runner.init_state(problem, make_optimizer(cfg.lr, 4), seed=0)
    mesh = make_mesh(n_data=2, n_model=3)
    with pytest.raises(ValueError, match="not divisible by the 'model'"):
        shard_state(mesh, state)

    # lazy geometry (per-sample coordinates, no dist_up) cannot be
    # row-sharded — silent no-op would decode every row on every device
    from position_induced_transformer_tpu.models import build_geometry

    m = jnp.linspace(0, 1, 17)[:-1].reshape(-1, 1)
    lazy = build_geometry(m, m, m, metric="euclidean",
                          en_loc=0.5, de_loc=0.5, lazy=True)
    sp_mesh = make_mesh(n_data=8, n_model=1)
    with pytest.raises(ValueError, match="lazy"):
        sequence_shard_geometry(sp_mesh, lazy)


def test_runner_train_dcn_mesh_matches_single_device():
    """Multi-slice data parallelism through the production runner: the
    batch shards over ('dcn', 'data') — the outer axis's gradient
    all-reduce is the one DCN-crossing collective on real multi-slice
    hardware — and reproduces the single-device run. On the fake CPU mesh
    both axes ride the same interconnect; the program is identical."""
    cfg = configs.BURGERS
    cfg = dataclasses.replace(
        cfg,
        grid=(64,), latent_grid=(16,), batch_size=8,
        model=dataclasses.replace(cfg.model, hid_dim=16, n_blocks=2),
    )
    kw = dict(epochs=2, ntrain=32, ntest=13, verbose=False)
    _, s1, h1 = runner.train(cfg, **kw)
    _, s2, h2 = runner.train(cfg, mesh="dcn=2,data=2,model=2", **kw)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    for r1, r2 in zip(h1, h2):
        np.testing.assert_allclose(
            r1["train_loss"], r2["train_loss"], rtol=1e-4
        )
        np.testing.assert_allclose(r1["rel_l2"], r2["rel_l2"], rtol=1e-4)


def test_runner_train_mesh_matches_single_device():
    """The PRODUCTION path: runner.train(mesh='data=4,model=2') — state
    sharded, geometry/data replicated, GSPMD collectives — reproduces the
    single-device run exactly (same shuffles, same arithmetic graph up to
    reduction order). ntest=13 also exercises the padded eval tail batch
    under the mesh."""
    cfg = configs.BURGERS
    cfg = dataclasses.replace(
        cfg,
        grid=(64,), latent_grid=(16,), batch_size=8,
        model=dataclasses.replace(cfg.model, hid_dim=16, n_blocks=2),
    )
    kw = dict(epochs=2, ntrain=32, ntest=13, verbose=False)
    _, s1, h1 = runner.train(cfg, **kw)
    _, s2, h2 = runner.train(cfg, mesh="data=4,model=2", **kw)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    for r1, r2 in zip(h1, h2):
        np.testing.assert_allclose(
            r1["train_loss"], r2["train_loss"], rtol=1e-4
        )
        np.testing.assert_allclose(r1["rel_l2"], r2["rel_l2"], rtol=1e-4)


def test_runner_train_mesh_per_sample_geometry_matches_single_device():
    """DP over a per-sample-geometry benchmark (elasticity: point-cloud
    coordinates travel IN the batch and geometry is rebuilt per step via
    task.geom_fn): runner.train(mesh='data=4') shards those coordinate
    batches too and reproduces the single-device run. On TPU this same
    path routes through the batched Pallas kernel, whose batch-dim
    custom_partitioning rules are covered by
    test_batched_kernel_data_sharded_matches_unsharded."""
    cfg = configs.get("elasticity")
    cfg = dataclasses.replace(
        cfg,
        batch_size=8,
        model=dataclasses.replace(cfg.model, hid_dim=16, n_blocks=2),
    )
    kw = dict(
        epochs=2, ntrain=16, ntest=9, verbose=False,
        setup_kwargs={"n_points": 48},
    )
    _, s1, h1 = runner.train(cfg, **kw)
    _, s2, h2 = runner.train(cfg, mesh="data=4", **kw)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    for r1, r2 in zip(h1, h2):
        np.testing.assert_allclose(
            r1["train_loss"], r2["train_loss"], rtol=1e-4
        )
        np.testing.assert_allclose(r1["rel_l2"], r2["rel_l2"], rtol=1e-4)


def test_runner_train_pipeline_mesh_matches_single_device():
    """The PRODUCTION pipeline-parallel path: runner.train(mesh='stage=2')
    GPipe-splits the processor blocks over 2 devices and reproduces the
    single-device run (loss + eval metrics + trained params). ntest=13
    exercises the padded eval tail under the microbatched schedule."""
    cfg = configs.BURGERS
    cfg = dataclasses.replace(
        cfg,
        grid=(64,), latent_grid=(16,), batch_size=8,
        model=dataclasses.replace(cfg.model, hid_dim=16, n_blocks=2),
    )
    kw = dict(epochs=2, ntrain=32, ntest=13, verbose=False)
    _, s1, h1 = runner.train(cfg, **kw)
    _, s2, h2 = runner.train(cfg, mesh="stage=2", **kw)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    for r1, r2 in zip(h1, h2):
        np.testing.assert_allclose(
            r1["train_loss"], r2["train_loss"], rtol=1e-4
        )
        np.testing.assert_allclose(r1["rel_l2"], r2["rel_l2"], rtol=1e-4)


def test_predict_after_pipeline_train_rounds_microbatches():
    """runner.predict on a pipeline-trained problem must round its batch
    size to the schedule's microbatch count: with ntest=7 the naive
    bs=min(8,7)=7 is not divisible by n_micro=2 and the pipelined forward
    raises — the post-train `--save-pred/--plots` path would crash after
    the whole training run. Also checks parity vs a single-device run."""
    cfg = configs.BURGERS
    cfg = dataclasses.replace(
        cfg,
        grid=(64,), latent_grid=(16,), batch_size=8,
        model=dataclasses.replace(cfg.model, hid_dim=16, n_blocks=2),
    )
    kw = dict(epochs=1, ntrain=16, ntest=7, verbose=False)
    p1, s1, _ = runner.train(cfg, **kw)
    p2, s2, _ = runner.train(cfg, mesh="stage=2", **kw)
    assert p2.task.pp_micro == 2
    pred1 = runner.predict(p1, s1)
    pred2 = runner.predict(p2, s2)
    assert pred2.shape == pred1.shape == (7, 64, 1)
    np.testing.assert_allclose(
        np.asarray(pred2), np.asarray(pred1), rtol=2e-4, atol=2e-5
    )


def test_runner_train_pipeline_rejects_tf_family():
    cfg = configs.get("burgers_tf")
    cfg = dataclasses.replace(
        cfg,
        grid=(64,), latent_grid=(16,), batch_size=8,
        model=dataclasses.replace(cfg.model, hid_dim=16, n_blocks=2),
    )
    with pytest.raises(ValueError, match="torch-family"):
        runner.train(
            cfg, mesh="stage=2", epochs=1, ntrain=16, ntest=8, verbose=False
        )


def test_runner_train_mesh_rejects_indivisible_batch():
    cfg = configs.BURGERS
    cfg = dataclasses.replace(
        cfg,
        grid=(64,), latent_grid=(16,), batch_size=6,
        model=dataclasses.replace(cfg.model, hid_dim=16, n_blocks=2),
    )
    with pytest.raises(ValueError, match="not divisible"):
        runner.train(
            cfg, mesh="data=4", epochs=1, ntrain=24, ntest=8, verbose=False
        )


def test_evaluate_zssr_sequence_parallel_matches(tmp_path):
    """`evaluate --zssr --mesh data=8` shards the decoder query rows
    (121 = 11^2 rows here, NOT divisible by 8 -> padded) and must return
    the same metrics as the unsharded evaluation."""
    import os

    from position_induced_transformer_tpu.train import evaluate

    cfg = configs.DARCY
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, hid_dim=16, n_blocks=2),
        latent_grid=(8, 8), batch_size=8,
    )
    ckpt = os.path.join(tmp_path, "ckpt")
    runner.train(
        cfg, epochs=1, ntrain=16, ntest=8, verbose=False,
        checkpoint_path=ckpt, setup_kwargs={"downsampling": 40},
    )
    kw = dict(ntest=8, zssr=True, zssr_downsampling=40)
    ref = evaluate.evaluate(cfg, checkpoint_path=ckpt, **kw)
    sp = evaluate.evaluate(cfg, checkpoint_path=ckpt, mesh="data=8", **kw)
    np.testing.assert_allclose(sp["rel_l2"], ref["rel_l2"], rtol=1e-5)
    np.testing.assert_allclose(sp["rel_l1"], ref["rel_l1"], rtol=1e-5)


def test_evaluate_zssr_sequence_parallel_tf(tmp_path):
    """TF-family ZSSR under a mesh: decoder rows constrained in-jit
    (uneven shards — m_cross is consumed transposed by the encoder, so no
    padding); metrics match the unsharded evaluation."""
    import os

    from position_induced_transformer_tpu.train import evaluate

    cfg = configs.DARCY_TF
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, hid_dim=16, n_blocks=2),
        latent_grid=(8, 8), batch_size=8,
    )
    ckpt = os.path.join(tmp_path, "ckpt_tf")
    runner.train(
        cfg, epochs=1, ntrain=16, ntest=8, verbose=False,
        checkpoint_path=ckpt, setup_kwargs={"downsampling": 40},
    )
    kw = dict(ntest=8, zssr=True, zssr_downsampling=40)
    ref = evaluate.evaluate(cfg, checkpoint_path=ckpt, **kw)
    sp = evaluate.evaluate(cfg, checkpoint_path=ckpt, mesh="data=8", **kw)
    np.testing.assert_allclose(sp["rel_l2"], ref["rel_l2"], rtol=1e-5)


def test_evaluate_data_parallel_matches(tmp_path):
    """Plain (non-ZSSR) `evaluate --mesh data=4`: batches shard over
    'data'; metrics match the single-device evaluation."""
    import os

    from position_induced_transformer_tpu.train import evaluate

    cfg = configs.BURGERS
    cfg = dataclasses.replace(
        cfg,
        grid=(64,), latent_grid=(16,), batch_size=8,
        model=dataclasses.replace(cfg.model, hid_dim=16, n_blocks=2),
    )
    ckpt = os.path.join(tmp_path, "ckpt")
    runner.train(
        cfg, epochs=1, ntrain=16, ntest=8, verbose=False, checkpoint_path=ckpt
    )
    ref = evaluate.evaluate(cfg, checkpoint_path=ckpt, ntest=8)
    dp = evaluate.evaluate(cfg, checkpoint_path=ckpt, ntest=8, mesh="data=4")
    np.testing.assert_allclose(dp["rel_l2"], ref["rel_l2"], rtol=1e-5)
    np.testing.assert_allclose(dp["rel_max"], ref["rel_max"], rtol=1e-5)


def test_infer_data_parallel_per_sample_mesh(tmp_path):
    """`infer --mesh data=2` on a per-sample-geometry benchmark: the
    multi-variable batch dict (x + mesh read from the .mat input) shards
    over 'data' and predictions match the unsharded infer run."""
    import os

    from scipy.io import savemat

    from position_induced_transformer_tpu.train import evaluate

    cfg = dataclasses.replace(
        configs.ELASTICITY, batch_size=4,
        model=dataclasses.replace(
            configs.ELASTICITY.model, hid_dim=16, n_blocks=2
        ),
    )
    ckpt = os.path.join(tmp_path, "ckpt")
    problem, state, _ = runner.train(
        cfg, epochs=1, ntrain=8, ntest=4, verbose=False,
        checkpoint_path=ckpt, setup_kwargs={"n_points": 48},
    )
    savemat(
        os.path.join(tmp_path, "inp.mat"),
        {
            "x": np.asarray(problem.test_data["x"])[:3],
            "mesh": np.asarray(problem.test_data["mesh"])[:3],
        },
    )
    kw = dict(
        checkpoint_path=ckpt,
        input_path=os.path.join(tmp_path, "inp.mat"),
        setup_kwargs={"n_points": 48},
    )
    evaluate.infer(cfg, output_path=os.path.join(tmp_path, "p0.npy"), **kw)
    evaluate.infer(
        cfg, output_path=os.path.join(tmp_path, "p2.npy"), mesh="data=2", **kw
    )
    np.testing.assert_allclose(
        np.load(os.path.join(tmp_path, "p2.npy")),
        np.load(os.path.join(tmp_path, "p0.npy")),
        rtol=1e-5, atol=1e-6,
    )


def test_evaluate_pipeline_parallel_matches(tmp_path):
    """`evaluate --mesh stage=2`: the forward runs GPipe pipeline-parallel
    over the processor blocks; metrics match the single-device evaluation."""
    import os

    from position_induced_transformer_tpu.train import evaluate

    cfg = configs.BURGERS
    cfg = dataclasses.replace(
        cfg,
        grid=(64,), latent_grid=(16,), batch_size=8,
        model=dataclasses.replace(cfg.model, hid_dim=16, n_blocks=2),
    )
    ckpt = os.path.join(tmp_path, "ckpt")
    runner.train(
        cfg, epochs=1, ntrain=16, ntest=8, verbose=False, checkpoint_path=ckpt
    )
    ref = evaluate.evaluate(cfg, checkpoint_path=ckpt, ntest=8)
    pp = evaluate.evaluate(cfg, checkpoint_path=ckpt, ntest=8, mesh="stage=2")
    np.testing.assert_allclose(pp["rel_l2"], ref["rel_l2"], rtol=1e-5)
    np.testing.assert_allclose(pp["rel_max"], ref["rel_max"], rtol=1e-5)


def test_multihost_two_process_train_matches_single(tmp_path):
    """PRODUCTION multi-host entry (parallel/multihost.py): two separate
    JAX processes (gloo CPU collectives, one device each) joined via the
    CLI's --multihost wiring train `--mesh data=2` SPMD over the global
    2-device mesh — and reproduce the single-process loss/metrics
    bit-for-bit. Also writes an orbax checkpoint collectively (both
    processes call save) and restores it here, single-process, for an
    evaluate — the pod-trained -> one-chip flow."""
    import json
    import os
    import socket
    import subprocess
    import sys

    # free port for the coordinator
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    ckpt_path = os.path.join(tmp_path, "ckpt")
    child = os.path.join(tmp_path, "child.py")
    with open(child, "w") as f:
        f.write(
            """
import sys, json
rank = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", sys.argv[5])
sys.path.insert(0, sys.argv[4])
from position_induced_transformer_tpu.parallel import multihost
multihost.initialize(
    f"coordinator=localhost:{port},num_processes=2,process_id={rank}"
)
import dataclasses
from position_induced_transformer_tpu import configs
from position_induced_transformer_tpu.train import runner
cfg = dataclasses.replace(
    configs.BURGERS, grid=(64,), latent_grid=(16,), batch_size=8,
    model=dataclasses.replace(
        configs.BURGERS.model, hid_dim=16, n_blocks=2
    ),
)
problem, state, hist = runner.train(
    cfg, epochs=2, ntrain=16, ntest=8, verbose=False, mesh="data=2",
    checkpoint_path=sys.argv[6],
)
if multihost.is_main():
    json.dump(hist[-1], open(out, "w"))
"""
        )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = os.path.abspath(os.path.join(repo, ".jax_cache"))
    hist_path = os.path.join(tmp_path, "hist.json")
    env = dict(os.environ, XLA_FLAGS="--xla_force_host_platform_device_count=1")
    procs = [
        subprocess.Popen(
            [
                sys.executable, child, str(r), str(port), hist_path,
                repo, cache, ckpt_path,
            ],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        for r in (0, 1)
    ]
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err.decode()[-3000:]

    cfg = dataclasses.replace(
        configs.BURGERS, grid=(64,), latent_grid=(16,), batch_size=8,
        model=dataclasses.replace(
            configs.BURGERS.model, hid_dim=16, n_blocks=2
        ),
    )
    single_ckpt = os.path.join(tmp_path, "ckpt_single")
    _, _, h1 = runner.train(
        cfg, epochs=2, ntrain=16, ntest=8, verbose=False,
        checkpoint_path=single_ckpt,
    )
    got = json.load(open(hist_path))
    np.testing.assert_allclose(
        got["train_loss"], h1[-1]["train_loss"], rtol=1e-6
    )
    np.testing.assert_allclose(got["rel_l2"], h1[-1]["rel_l2"], rtol=1e-6)

    # the collectively-written checkpoint restores on this (different,
    # 8-fake-device) topology and evaluates exactly like the
    # single-process-trained one
    from position_induced_transformer_tpu.train import evaluate

    res = evaluate.evaluate(cfg, checkpoint_path=ckpt_path, ntest=8)
    ref = evaluate.evaluate(cfg, checkpoint_path=single_ckpt, ntest=8)
    np.testing.assert_allclose(res["rel_l2"], ref["rel_l2"], rtol=1e-6)


def test_multihost_spec_errors():
    from position_induced_transformer_tpu.parallel import multihost

    with pytest.raises(ValueError, match="bad --multihost"):
        multihost.initialize("coordinator=localhost:1,nproc=2")
    with pytest.raises(ValueError, match="missing"):
        multihost.initialize("coordinator=localhost:1,num_processes=2")


def test_grad_accum_composes_with_data_mesh():
    """--grad-accum under --mesh data=N: each microbatch is sharding-
    constrained over the data axis and the accumulated trajectory still
    matches the plain single-device full-batch run."""
    cfg = configs.BURGERS
    cfg = dataclasses.replace(
        cfg,
        grid=(64,), latent_grid=(16,), batch_size=8,
        model=dataclasses.replace(cfg.model, hid_dim=16, n_blocks=2),
    )
    kw = dict(epochs=2, ntrain=16, ntest=8, verbose=False)
    _, s1, h1 = runner.train(cfg, **kw)
    _, s2, h2 = runner.train(cfg, mesh="data=2", grad_accum=2, **kw)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    for r1, r2 in zip(h1, h2):
        np.testing.assert_allclose(
            r1["train_loss"], r2["train_loss"], rtol=1e-4
        )
    # microbatch indivisible by the data axis -> clean error
    with pytest.raises(ValueError, match="data"):
        runner.train(cfg, mesh="data=4", grad_accum=4, **kw)


def test_grad_accum_composes_with_pipeline_mesh():
    """--grad-accum under --mesh stage=K: microbatches run through the
    GPipe schedule (micro size divisible by its pp_micro) and match the
    single-device full-batch trajectory."""
    cfg = configs.BURGERS
    cfg = dataclasses.replace(
        cfg,
        grid=(64,), latent_grid=(16,), batch_size=8,
        model=dataclasses.replace(cfg.model, hid_dim=16, n_blocks=2),
    )
    kw = dict(epochs=2, ntrain=16, ntest=8, verbose=False)
    _, s1, h1 = runner.train(cfg, **kw)
    _, s2, h2 = runner.train(cfg, mesh="stage=2", grad_accum=2, **kw)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    for r1, r2 in zip(h1, h2):
        np.testing.assert_allclose(
            r1["train_loss"], r2["train_loss"], rtol=1e-4
        )


def test_grad_accum_deep_pipeline_schedules_from_microbatch():
    """stage=4 with --grad-accum 4 on batch 8: the GPipe schedule must be
    picked from the per-forward microbatch (8/4 = 2 samples -> 2 GPipe
    microbatches), not the full optimizer batch (whose 4-microbatch
    schedule cannot split a 2-sample forward — this combination used to
    be spuriously rejected). Trajectory still matches single-device."""
    cfg = configs.BURGERS
    cfg = dataclasses.replace(
        cfg,
        grid=(64,), latent_grid=(16,), batch_size=8,
        model=dataclasses.replace(cfg.model, hid_dim=16, n_blocks=4),
    )
    kw = dict(epochs=2, ntrain=16, ntest=8, verbose=False)
    _, s1, h1 = runner.train(cfg, **kw)
    _, s2, h2 = runner.train(cfg, mesh="stage=4", grad_accum=4, **kw)
    assert s2  # reached training (no spurious divisibility ValueError)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    for r1, r2 in zip(h1, h2):
        np.testing.assert_allclose(
            r1["train_loss"], r2["train_loss"], rtol=1e-4
        )


def test_bf16_composes_with_data_model_mesh():
    """Mixed precision under DP x TP: the GSPMD-sharded f32 params are
    cast at use; the bf16 run on a 2x2 mesh matches the single-device
    bf16 run (same arithmetic graph up to reduction order)."""
    cfg = configs.BURGERS
    cfg = dataclasses.replace(
        cfg,
        grid=(64,), latent_grid=(16,), batch_size=8,
        model=dataclasses.replace(
            cfg.model, hid_dim=16, n_blocks=2, compute_dtype="bfloat16"
        ),
    )
    kw = dict(epochs=2, ntrain=16, ntest=8, verbose=False)
    _, s1, h1 = runner.train(cfg, **kw)
    _, s2, h2 = runner.train(cfg, mesh="data=2,model=2", **kw)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        # bf16 activations make per-step grads ~1e-3-relative noisy vs
        # the reduction-order change; params drift accordingly
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-3
        )
    for r1, r2 in zip(h1, h2):
        np.testing.assert_allclose(
            r1["train_loss"], r2["train_loss"], rtol=1e-2
        )
