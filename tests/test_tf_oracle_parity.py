"""PiTTF / PiTTFPointCloud pinned bit-level-ish against the independent
numpy oracle (tests/tf_numpy_oracle.py, hand-ported from the reference
TensorFlow source) with SHARED weights — the same standard the torch
family meets against the installed torch package (tests/reference_oracle.py).

Meshes are random point clouds so no two distances tie (quantile
tie-breaking on regular grids is fp-fragile — see test_ops_core.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from position_induced_transformer_tpu.models import (
    PiTTF,
    PiTTFPointCloud,
    TFGeometry,
    tf_precompute_thresholds,
)
from position_induced_transformer_tpu.ops import euclidean_sq

from tests import tf_numpy_oracle as oracle


def _rand_mesh(rng, n, d=1):
    return jnp.asarray(rng.uniform(0, 1, (n, d)), jnp.float32)


def _geom(rng, lq, ll, d=1):
    gq, gl = _rand_mesh(rng, lq, d), _rand_mesh(rng, ll, d)
    return (
        gq,
        TFGeometry(
            m_qry=euclidean_sq(gq, gq),
            m_cross=euclidean_sq(gq, gl),
            m_ltt=euclidean_sq(gl, gl),
        ),
    )


def _compare(model, geom, mesh, x, bandwidth, use_up2, en_loc, de_loc):
    params = model.init(jax.random.PRNGKey(0), geom, mesh, x)["params"]
    got = np.asarray(
        jax.jit(model.apply)({"params": params}, geom, mesh, x)
    )
    want = oracle.pit_tf_forward(
        params,
        np.asarray(geom.m_qry) if geom.m_qry is not None else None,
        np.asarray(geom.m_cross),
        np.asarray(geom.m_ltt),
        np.asarray(mesh),
        np.asarray(x),
        en_loc,
        de_loc,
        n_blocks=model.n_blocks,
        bandwidth=bandwidth,
        use_decoder_selfatt=use_up2,
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    return params


@pytest.mark.parametrize(
    "bandwidth,use_up2,en_loc,de_loc",
    [
        ("tan_sin", True, 30.0, 60.0),  # 1_InviscidBurgers architecture
        ("square", True, 40.0, 20.0),  # 2_ShockTube
        ("tan_sin", False, 25.0, 50.0),  # 3_Darcy2D (minus in-call denorm)
        ("tan", False, 35.0, 200.0),  # 6_NACA (incl. a global role)
    ],
)
def test_pittf_matches_numpy_oracle(bandwidth, use_up2, en_loc, de_loc):
    rng = np.random.default_rng(3)
    mesh, geom = _geom(rng, lq=24, ll=12)
    model = PiTTF(
        out_dim=2, hid_dim=16, n_head=2,
        locality_encoder=en_loc, locality_decoder=de_loc,
        n_blocks=2, bandwidth=bandwidth, use_decoder_selfatt=use_up2,
    )
    x = jnp.asarray(rng.standard_normal((3, 24, 2)), jnp.float32)
    _compare(model, geom, mesh, x, bandwidth, use_up2, en_loc, de_loc)


def test_pittf_precomputed_thresholds_match_oracle_and_incall():
    """The hoisted sign-aware thresholds (tf_precompute_thresholds) must
    reproduce both the in-call-quantile path and the numpy oracle —
    including a NEGATIVE tan-bandwidth head (pre-NonNeg-projection state,
    where quantile(s*d, p) = s*quantile(d, 1-p))."""
    rng = np.random.default_rng(7)
    mesh, geom = _geom(rng, lq=20, ll=10)
    en_loc, de_loc = 30.0, 45.0
    model = PiTTF(
        out_dim=1, hid_dim=16, n_head=2,
        locality_encoder=en_loc, locality_decoder=de_loc,
        n_blocks=1, bandwidth="tan", use_decoder_selfatt=False,
    )
    x = jnp.asarray(rng.standard_normal((2, 20, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), geom, mesh, x)["params"]
    # force one negative and one positive bandwidth in every attention op
    params = jax.tree_util.tree_map_with_path(
        lambda p, a: (
            jnp.asarray([[[-0.4]], [[0.3]]], jnp.float32)
            if any(getattr(k, "key", None) == "band_width" for k in p)
            else a
        ),
        params,
    )
    plain = jax.jit(model.apply)({"params": params}, geom, mesh, x)
    geom_thr = tf_precompute_thresholds(geom, en_loc, de_loc)
    hoisted = jax.jit(model.apply)({"params": params}, geom_thr, mesh, x)
    np.testing.assert_allclose(
        np.asarray(hoisted), np.asarray(plain), rtol=1e-5, atol=1e-6
    )
    want = oracle.pit_tf_forward(
        params, None, np.asarray(geom.m_cross), np.asarray(geom.m_ltt),
        np.asarray(mesh), np.asarray(x), en_loc, de_loc,
        n_blocks=1, bandwidth="tan", use_decoder_selfatt=False,
    )
    np.testing.assert_allclose(
        np.asarray(hoisted), want, rtol=2e-4, atol=2e-5
    )


def test_selfpit_precomputed_thresholds_match_incall():
    """The hybrid (selfpit) attention's hoisted thresholds reproduce the
    in-call-quantile path exactly — including a NEGATIVE tan-bandwidth
    head (pre-NonNeg-projection: quantile(s*d, p) = s*quantile(d, 1-p))."""
    rng = np.random.default_rng(9)
    mesh, geom = _geom(rng, lq=20, ll=20)  # selfpit: latent == query
    en_loc, de_loc = 30.0, 45.0
    model = PiTTF(
        out_dim=1, hid_dim=16, n_head=2,
        locality_encoder=en_loc, locality_decoder=de_loc,
        n_blocks=1, use_decoder_selfatt=True,
        processor_attention="hybrid", coder_attention="hybrid",
    )
    x = jnp.asarray(rng.standard_normal((2, 20, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(2), geom, mesh, x)["params"]
    params = jax.tree_util.tree_map_with_path(
        lambda p, a: (
            jnp.asarray([[[-0.4]], [[0.3]]], jnp.float32)
            if any(getattr(k, "key", None) == "band_width" for k in p)
            else a
        ),
        params,
    )
    plain = jax.jit(model.apply)({"params": params}, geom, mesh, x)
    geom_thr = tf_precompute_thresholds(geom, en_loc, de_loc)
    hoisted = jax.jit(model.apply)({"params": params}, geom_thr, mesh, x)
    np.testing.assert_allclose(
        np.asarray(hoisted), np.asarray(plain), rtol=1e-5, atol=1e-6
    )


def test_pittf_point_cloud_matches_numpy_oracle():
    """Elasticity-family point-cloud model (per-sample dist^2/2 built from
    the first two input channels) vs the oracle."""
    rng = np.random.default_rng(11)
    model = PiTTFPointCloud(
        out_dim=1, hid_dim=16, n_head=4,
        locality_encoder=35.0, locality_decoder=35.0, n_blocks=2,
    )
    x = jnp.asarray(rng.standard_normal((2, 18, 5)), jnp.float32)
    params = model.init(jax.random.PRNGKey(2), x)["params"]
    got = np.asarray(jax.jit(model.apply)({"params": params}, x))
    want = oracle.pit_tf_point_cloud_forward(
        params, np.asarray(x), 35.0, 35.0, n_blocks=2
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_pittf_gradients_finite_and_match_fd():
    """Spot-check: d(loss)/d(band_width) of the jax module matches a
    central finite difference through the numpy oracle (the mask is a
    locally constant set, so the FD is smooth for small eps)."""
    rng = np.random.default_rng(13)
    mesh, geom = _geom(rng, lq=16, ll=8)
    model = PiTTF(
        out_dim=1, hid_dim=8, n_head=1,
        locality_encoder=40.0, locality_decoder=40.0,
        n_blocks=1, use_decoder_selfatt=True,
    )
    x = jnp.asarray(rng.standard_normal((2, 16, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(3), geom, mesh, x)["params"]

    def loss(p):
        return jnp.sum(model.apply({"params": p}, geom, mesh, x) ** 2)

    g = jax.grad(loss)(params)["down"]["band_width"]

    def oracle_loss(r):
        p2 = jax.tree_util.tree_map(np.asarray, params)
        p2["down"] = dict(p2["down"], band_width=np.full((1, 1, 1), r))
        out = oracle.pit_tf_forward(
            p2, np.asarray(geom.m_qry), np.asarray(geom.m_cross),
            np.asarray(geom.m_ltt), np.asarray(mesh), np.asarray(x),
            40.0, 40.0, n_blocks=1, use_decoder_selfatt=True,
        )
        return float(np.sum(out**2))

    r0 = float(params["down"]["band_width"][0, 0, 0])
    eps = 1e-4
    fd = (oracle_loss(r0 + eps) - oracle_loss(r0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 0, 0]), fd, rtol=5e-3)


@pytest.mark.parametrize("variant", ["lite", "transformer", "selfpit"])
def test_pittf_variant_matches_numpy_oracle(variant):
    """The ablation variants (`--model-variant`) pinned against the
    independent oracle's transcription of the reference baselines
    (LiteTransformer utils.py:285-353, Transformer :355-416, SelfPiT
    :483-553) with shared weights. SelfPiT needs latent == query like the
    reference dir, so both use lq points."""
    rng = np.random.default_rng(17)
    lq = 20
    ll = lq if variant == "selfpit" else 10
    mesh, geom = _geom(rng, lq=lq, ll=ll)
    kinds = {
        "lite": dict(processor_attention="self"),
        "transformer": dict(
            processor_attention="self", coder_attention="self"
        ),
        "selfpit": dict(
            processor_attention="hybrid", coder_attention="hybrid"
        ),
    }[variant]
    model = PiTTF(
        out_dim=1, hid_dim=16, n_head=2,
        locality_encoder=30.0, locality_decoder=60.0,
        n_blocks=2, use_decoder_selfatt=True, **kinds,
    )
    x = jnp.asarray(rng.standard_normal((3, lq, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(5), geom, mesh, x)["params"]
    got = np.asarray(jax.jit(model.apply)({"params": params}, geom, mesh, x))

    from tests.tf_numpy_oracle import pit_tf_variant_forward

    want = pit_tf_variant_forward(
        params, np.asarray(geom.m_qry), np.asarray(geom.m_cross),
        np.asarray(geom.m_ltt), np.asarray(mesh), np.asarray(x),
        30.0, 60.0, variant, n_blocks=2, use_decoder_selfatt=True,
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def _np64(tree):
    return jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float64), tree
    )


def _f32(tree):
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), tree
    )


def _trajectory_sides(task, geom_for_task, batches, params, lr, oracle_fwd):
    """Run N optimizer steps on the repo side (make_optimizer('keras') +
    Task.loss_fn + param_constraint — the exact pieces make_train_epoch
    composes) and on the numpy-oracle side (adam_keras_step +
    cosine_decay + nonneg_project), feeding BOTH the same f32 gradients
    evaluated at the repo's current params. Update mechanics are thus
    isolated: any divergence is an Adam/schedule/constraint mismatch (the
    gradients themselves are pinned separately by the FD test above, and
    each step's loss is pinned against the oracle forward). Returns
    (repo_params_history, oracle_params_history)."""
    import optax

    from position_induced_transformer_tpu.train.loop import make_optimizer

    total = len(batches)
    opt = make_optimizer(lr, total, flavor="keras")
    opt_state = opt.init(params)
    p_repo = params
    p_oracle = _np64(params)
    adam_state = oracle.adam_keras_init(p_oracle)
    hist_repo, hist_oracle = [], []
    for step, batch in enumerate(batches):
        # per-step loss pinned against the oracle's own forward at the
        # oracle's params (ties the shared gradients to oracle semantics)
        loss_repo = float(task.loss_fn(p_repo, geom_for_task, batch))
        loss_oracle = oracle.rel_norm_loss(
            np.asarray(batch["y"]), oracle_fwd(_np64(p_repo), batch), p=1
        )
        np.testing.assert_allclose(loss_repo, loss_oracle, rtol=2e-4)

        grads = jax.grad(task.loss_fn)(p_repo, geom_for_task, batch)
        updates, opt_state = opt.update(grads, opt_state, p_repo)
        p_repo = optax.apply_updates(p_repo, updates)
        if task.param_constraint is not None:
            p_repo = task.param_constraint(p_repo)

        lr_step = oracle.cosine_decay(lr, step, total)
        p_oracle, adam_state = oracle.adam_keras_step(
            p_oracle, _np64(grads), adam_state, lr_step
        )
        if task.param_constraint is not None:
            p_oracle = oracle.nonneg_project(p_oracle)
        hist_repo.append(p_repo)
        hist_oracle.append(p_oracle)
        # next step's shared gradients must see identical params, or the
        # comparison silently degrades into a Lyapunov divergence test
        p_repo = _f32(p_oracle)
    return hist_repo, hist_oracle


def _assert_trees_close(a, b, atol, rtol):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x, np.float64), np.asarray(y, np.float64),
            atol=atol, rtol=rtol,
        )


@pytest.mark.parametrize(
    "bandwidth,use_up2",
    [("tan_sin", True), ("square", True), ("tan", False)],
)
def test_pittf_training_trajectory_matches_keras_adam_oracle(
    bandwidth, use_up2
):
    """5-step training trajectory of PiTTF under the production optimizer
    (make_optimizer flavor='keras', the one the runner picks for
    keras_adam tasks) matches the numpy keras-Adam + CosineDecay oracle —
    for all three bandwidth kinds, including NACA's NonNeg-projected tan.
    This is the TF-family counterpart of the torch family's bit-level
    optimizer-step trajectory parity vs installed torch (reference ground
    truth: tf.keras.optimizers.Adam + CosineDecay,
    tensorflow/1_InviscidBurgers/train.py:48)."""
    from position_induced_transformer_tpu.train.benchmarks import (
        nonneg_bandwidths,
    )
    from position_induced_transformer_tpu.train.loop import Task

    rng = np.random.default_rng(23)
    en_loc, de_loc = 40.0, 40.0
    mesh, geom = _geom(rng, lq=16, ll=8)
    model = PiTTF(
        out_dim=1, hid_dim=8, n_head=2,
        locality_encoder=en_loc, locality_decoder=de_loc,
        n_blocks=1, bandwidth=bandwidth, use_decoder_selfatt=use_up2,
    )
    batches = [
        {
            "x": jnp.asarray(rng.standard_normal((3, 16, 1)), jnp.float32),
            "y": jnp.asarray(rng.standard_normal((3, 16, 1)), jnp.float32),
        }
        for _ in range(5)
    ]
    params = model.init(
        jax.random.PRNGKey(0), geom, mesh, batches[0]["x"]
    )["params"]
    task = Task(
        model=model,
        apply_fn=lambda p, g, b: model.apply({"params": p}, g, mesh, b["x"]),
        loss_p=1, out_dim=1, batch_mean_loss=True, keras_adam=True,
        param_constraint=nonneg_bandwidths if bandwidth == "tan" else None,
    )

    def oracle_fwd(p64, batch):
        return oracle.pit_tf_forward(
            p64, np.asarray(geom.m_qry), np.asarray(geom.m_cross),
            np.asarray(geom.m_ltt), np.asarray(mesh), np.asarray(batch["x"]),
            en_loc, de_loc, n_blocks=1, bandwidth=bandwidth,
            use_decoder_selfatt=use_up2,
        )

    hist_repo, hist_oracle = _trajectory_sides(
        task, geom, batches, params, 1e-3, oracle_fwd
    )
    for p_r, p_o in zip(hist_repo, hist_oracle):
        _assert_trees_close(p_r, p_o, atol=1e-6, rtol=1e-5)


def test_pittf_point_cloud_training_trajectory_matches_keras_adam_oracle():
    """Same 5-step keras-Adam trajectory pin for the elasticity-family
    point-cloud model (per-sample distances, r^2 bandwidth)."""
    from position_induced_transformer_tpu.train.loop import Task

    rng = np.random.default_rng(29)
    model = PiTTFPointCloud(
        out_dim=1, hid_dim=8, n_head=2,
        locality_encoder=35.0, locality_decoder=35.0, n_blocks=1,
    )
    batches = [
        {
            "x": jnp.asarray(rng.standard_normal((2, 12, 4)), jnp.float32),
            "y": jnp.asarray(rng.standard_normal((2, 12, 1)), jnp.float32),
        }
        for _ in range(5)
    ]
    params = model.init(jax.random.PRNGKey(1), batches[0]["x"])["params"]
    task = Task(
        model=model,
        apply_fn=lambda p, g, b: model.apply({"params": p}, b["x"]),
        loss_p=2, out_dim=1, batch_mean_loss=True, keras_adam=True,
    )

    def oracle_fwd(p64, batch):
        return oracle.pit_tf_point_cloud_forward(
            p64, np.asarray(batch["x"]), 35.0, 35.0, n_blocks=1
        )

    def rel2(true, pred):
        return oracle.rel_norm_loss(true, pred, p=2)

    import optax

    from position_induced_transformer_tpu.train.loop import make_optimizer

    # loss_p=2 here, so inline the loop with the L2 oracle loss pin
    total, lr = len(batches), 1e-3
    opt = make_optimizer(lr, total, flavor="keras")
    opt_state = opt.init(params)
    p_repo, p_oracle = params, _np64(params)
    adam_state = oracle.adam_keras_init(p_oracle)
    for step, batch in enumerate(batches):
        loss_repo = float(task.loss_fn(p_repo, None, batch))
        loss_oracle = rel2(
            np.asarray(batch["y"]), oracle_fwd(_np64(p_repo), batch)
        )
        np.testing.assert_allclose(loss_repo, loss_oracle, rtol=2e-4)
        grads = jax.grad(task.loss_fn)(p_repo, None, batch)
        updates, opt_state = opt.update(grads, opt_state, p_repo)
        p_repo = optax.apply_updates(p_repo, updates)
        lr_step = oracle.cosine_decay(lr, step, total)
        p_oracle, adam_state = oracle.adam_keras_step(
            p_oracle, _np64(grads), adam_state, lr_step
        )
        _assert_trees_close(p_repo, p_oracle, atol=1e-6, rtol=1e-5)
        p_repo = _f32(p_oracle)


def test_keras_adam_differs_from_optax_adam():
    """The two formulations genuinely differ (epsilon placement): with a
    tiny-gradient parameter the optax update and the keras update diverge
    well beyond the trajectory test's tolerance — i.e. the parity test
    above has teeth."""
    import optax

    from position_induced_transformer_tpu.train.loop import make_optimizer

    params = {"w": jnp.asarray([1.0, 1.0], jnp.float32)}
    grads = {"w": jnp.asarray([1e-6, 1.0], jnp.float32)}
    out = {}
    for flavor in ("adam", "keras"):
        opt = make_optimizer(1e-3, 10, flavor=flavor)
        st = opt.init(params)
        upd, _ = opt.update(grads, st, params)
        out[flavor] = np.asarray(upd["w"])
    # tiny-gradient coordinate: keras' uncorrected sqrt(v)+eps denominator
    # is ~eps-dominated differently from optax's corrected one
    assert abs(out["adam"][0] - out["keras"][0]) > 1e-5 * abs(
        out["keras"][0]
    )


def test_selfpit_bandwidth_is_plain_tan_with_nonneg_constraint():
    """The hybrid attention's forward is plain tan(r) (full gradient at
    r < 0); the keras NonNeg constraint is project-after-update via
    Task.param_constraint (reference utils.py:437), wired automatically
    for the selfpit variant."""
    import dataclasses

    from position_induced_transformer_tpu import configs
    from position_induced_transformer_tpu.train import benchmarks

    # wide localities: at the reference's 1-percentile on a 32-point row
    # only one entry survives the mask, making the softmax one-hot and the
    # bandwidth gradient legitimately zero — not what this test probes
    cfg = dataclasses.replace(
        configs.BURGERS_TF,
        grid=(32,), latent_grid=(32,), batch_size=4,
        model=dataclasses.replace(
            configs.BURGERS_TF.model, hid_dim=8, n_blocks=1,
            en_loc=50.0, de_loc=50.0,
        ),
        model_variant="selfpit",
    )
    problem = benchmarks.setup(cfg, ntrain=8, ntest=4)
    assert problem.task.param_constraint is not None
    params = problem.init_fn(
        jax.random.PRNGKey(0),
        jax.tree_util.tree_map(lambda a: a[:2], problem.train_data),
    )["params"]
    # force a negative bandwidth; the constraint projects it to 0
    params = jax.tree_util.tree_map_with_path(
        lambda p, a: (
            jnp.full_like(a, -0.5)
            if any(getattr(k, "key", None) == "band_width" for k in p)
            else a
        ),
        params,
    )
    projected = problem.task.param_constraint(params)
    assert float(projected["down"]["band_width"].min()) == 0.0
    # plain-tan forward: gradient w.r.t. a negative r is nonzero
    batch = jax.tree_util.tree_map(lambda a: a[:4], problem.train_data)
    g = jax.grad(problem.task.loss_fn)(params, problem.geom, batch)
    assert float(jnp.abs(g["down"]["band_width"]).max()) > 0.0
