"""TF-semantics models and ablation baselines: shape/grad/behavior tests.

(TensorFlow itself isn't available here, so these are validated against the
documented semantics — additive residuals, in-op value projection with
v_dim = hid/heads, percentile locality with >100 = global — plus training
smoke checks. Distance-builder outputs are checked against hand math.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from position_induced_transformer_tpu.models import (
    LiteTransformer,
    MultiHeadPosAtt,
    PiTTF,
    SelfPiT,
    TFGeometry,
    Transformer,
    pairwise_dist_half,
    pairwise_dist_periodic_1d,
)


def _geom(L=32, Lt=8):
    m_qry = pairwise_dist_periodic_1d(L, L)
    m_cross = pairwise_dist_periodic_1d(L, Lt)
    m_ltt = pairwise_dist_periodic_1d(Lt, Lt)
    return TFGeometry(m_qry, m_cross, m_ltt)


def _mesh(L=32):
    return jnp.linspace(0, 1, L + 1)[:-1].reshape(-1, 1)


def test_pairwise_dist_builders():
    d = pairwise_dist_periodic_1d(8, 8)
    assert d.shape == (8, 8)
    # normalized by max periodic distance^2 (0.25) -> values in [0, 1]
    assert float(jnp.max(d)) <= 1.0 + 1e-6
    np.testing.assert_allclose(np.asarray(d), np.asarray(d).T, atol=1e-7)

    a = jnp.array([[0.0, 0.0], [3.0, 4.0]])
    dh = pairwise_dist_half(a, a)
    np.testing.assert_allclose(np.asarray(dh), [[0, 12.5], [12.5, 0]], rtol=1e-6)


def test_mhpa_value_projection_and_global():
    rng = np.random.default_rng(0)
    L, B, hid, H = 16, 2, 8, 2
    d = pairwise_dist_periodic_1d(L, L)
    x = jnp.asarray(rng.random((B, L, 5)), jnp.float32)
    mod = MultiHeadPosAtt(n_head=H, hid_dim=hid, locality=200.0)
    params = mod.init(jax.random.PRNGKey(0), d, x)
    out = mod.apply(params, d, x)
    assert out.shape == (B, L, hid)  # v_dim = hid/H, concat back to hid
    # locality <= 100 masks: different output
    mod_loc = MultiHeadPosAtt(n_head=H, hid_dim=hid, locality=30.0)
    out_loc = mod_loc.apply(params, d, x)
    assert not np.allclose(np.asarray(out), np.asarray(out_loc))


@pytest.mark.parametrize("bandwidth", ["tan_sin", "square", "tan"])
def test_pit_tf_forward_and_train_step(bandwidth):
    rng = np.random.default_rng(1)
    L, Lt, B = 32, 8, 4
    geom, mesh = _geom(L, Lt), _mesh(L)
    x = jnp.asarray(rng.random((B, L, 1)), jnp.float32)
    y = jnp.asarray(rng.random((B, L, 1)), jnp.float32)
    model = PiTTF(
        out_dim=1, hid_dim=8, n_head=2, locality_encoder=6.0,
        locality_decoder=6.0, n_blocks=2, bandwidth=bandwidth,
    )
    params = model.init(jax.random.PRNGKey(0), geom, mesh, x)
    out = jax.jit(model.apply)(params, geom, mesh, x)
    assert out.shape == (B, L, 1)

    # one optimization step reduces the loss
    opt = optax.adam(1e-3)
    ost = opt.init(params)

    def loss(p):
        o = model.apply(p, geom, mesh, x)
        return jnp.mean(jnp.abs(o - y))

    l0, g = jax.value_and_grad(loss)(params)
    upd, ost = opt.update(g, ost, params)
    params2 = optax.apply_updates(params, upd)
    assert float(loss(params2)) < float(l0)


def test_baselines_forward_shapes():
    rng = np.random.default_rng(2)
    L, Lt, B = 32, 8, 3
    geom, mesh = _geom(L, Lt), _mesh(L)
    x = jnp.asarray(rng.random((B, L, 1)), jnp.float32)

    lite = LiteTransformer(out_dim=1, hid_dim=8, n_head=2, n_blocks=2)
    p = lite.init(jax.random.PRNGKey(0), geom, mesh, x)
    assert lite.apply(p, geom, mesh, x).shape == (B, L, 1)

    tr = Transformer(out_dim=1, hid_dim=8, n_head=2, n_blocks=2)
    p = tr.init(jax.random.PRNGKey(0), mesh, x)
    assert tr.apply(p, mesh, x).shape == (B, L, 1)

    # SelfPiT's hybrid logits are dot-product-shaped (L, L); like the
    # reference it requires latent res == query res (square m_cross).
    sq = _geom(L, L)
    sp = SelfPiT(out_dim=1, hid_dim=8, n_head=2, n_blocks=2,
                 locality_encoder=6.0, locality_decoder=6.0)
    p = sp.init(jax.random.PRNGKey(0), sq, mesh, x)
    assert sp.apply(p, sq, mesh, x).shape == (B, L, 1)


def test_baselines_train_end_to_end():
    """The ablation baselines optimize (one Adam step reduces loss) — they
    are usable drop-ins in the training loop, matching the commented-out
    alternates in the TF drivers (tensorflow/1_InviscidBurgers/train.py:39-40)."""
    import optax

    rng = np.random.default_rng(7)
    L, Lt, B = 32, 8, 4
    geom, mesh = _geom(L, Lt), _mesh(L)
    x = jnp.asarray(rng.random((B, L, 1)), jnp.float32)
    y = jnp.asarray(rng.random((B, L, 1)), jnp.float32)

    cases = [
        (LiteTransformer(out_dim=1, hid_dim=8, n_head=2, n_blocks=2),
         lambda m, p: m.apply(p, geom, mesh, x)),
        (Transformer(out_dim=1, hid_dim=8, n_head=2, n_blocks=2),
         lambda m, p: m.apply(p, mesh, x)),
    ]
    for model, fwd in cases:
        params = (
            model.init(jax.random.PRNGKey(0), geom, mesh, x)
            if isinstance(model, LiteTransformer)
            else model.init(jax.random.PRNGKey(0), mesh, x)
        )
        opt = optax.adam(1e-3)
        ost = opt.init(params)

        def loss(p):
            return jnp.mean(jnp.abs(fwd(model, p) - y))

        l0, g = jax.value_and_grad(loss)(params)
        upd, ost = opt.update(g, ost, params)
        params = optax.apply_updates(params, upd)
        assert float(loss(params)) < float(l0), type(model).__name__


def test_tf_precomputed_thresholds_match_in_op_quantile():
    """PiTTF with setup-time raw-distance thresholds (tf_precompute_thresholds)
    produces the same output as the reference-style in-op per-head percentile
    over the scaled distances — the mask commutes with the non-negative
    bandwidth (ops/locality.py). Random (tie-free) clouds."""
    from position_induced_transformer_tpu.models import tf_precompute_thresholds

    rng = np.random.default_rng(5)
    L, Lt, B = 37, 9, 3
    pts_q = jnp.asarray(rng.random((L, 2)), jnp.float32)
    pts_l = jnp.asarray(rng.random((Lt, 2)), jnp.float32)
    geom = TFGeometry(
        m_qry=pairwise_dist_half(pts_q, pts_q),
        m_cross=pairwise_dist_half(pts_q, pts_l),
        m_ltt=pairwise_dist_half(pts_l, pts_l),
    )
    geom_thr = tf_precompute_thresholds(geom, 20.0, 30.0)
    assert geom_thr.thr_down is not None and geom_thr.thr_qry is not None

    x = jnp.asarray(rng.random((B, L, 1)), jnp.float32)
    mesh = jnp.asarray(rng.random((L, 1)), jnp.float32)
    for bandwidth in ("tan_sin", "square"):
        model = PiTTF(
            out_dim=1, hid_dim=8, n_head=2, locality_encoder=20.0,
            locality_decoder=30.0, n_blocks=1, bandwidth=bandwidth,
        )
        params = model.init(jax.random.PRNGKey(0), geom, mesh, x)
        out_quantile = model.apply(params, geom, mesh, x)
        out_thr = model.apply(params, geom_thr, mesh, x)
        np.testing.assert_allclose(
            np.asarray(out_thr), np.asarray(out_quantile), rtol=1e-6, atol=1e-7
        )


def test_pointcloud_shared_mask_matches_per_head_quantile():
    """PiTTFPointCloud's once-per-call raw-distance threshold equals the
    per-head quantile over the r^2-scaled distances."""
    from position_induced_transformer_tpu.models import PiTTFPointCloud
    from position_induced_transformer_tpu.models.pit_tf import (
        MultiHeadPosAttBatched,
    )
    from position_induced_transformer_tpu.ops.locality import quantile_threshold

    rng = np.random.default_rng(6)
    B, L, hid, H = 2, 24, 8, 4
    x = jnp.asarray(rng.random((B, L, 4)), jnp.float32)
    coords = x[..., :2]
    diff = coords[:, :, None, :] - coords[:, None, :, :]
    m_dist = 0.5 * jnp.sum(diff * diff, axis=-1)
    thr = quantile_threshold(m_dist, 0.25)
    mod = MultiHeadPosAttBatched(n_head=H, hid_dim=hid, locality=25.0)
    params = mod.init(jax.random.PRNGKey(1), m_dist, x)
    out_per_head = mod.apply(params, m_dist, x)
    out_shared = mod.apply(params, m_dist, x, thr)
    np.testing.assert_allclose(
        np.asarray(out_shared), np.asarray(out_per_head), rtol=1e-6, atol=1e-7
    )


def test_tf_sign_indefinite_tan_thresholds_match_quantile():
    """The NACA 'tan' bandwidth can be NEGATIVE (pre-NonNeg-projection);
    the precomputed dual (p, 1-p) thresholds with the sign-aware rescale
    must reproduce the in-op per-head percentile exactly — including the
    order reversal a negative scale causes."""
    from position_induced_transformer_tpu.models import tf_precompute_thresholds

    rng = np.random.default_rng(7)
    L, Lt, B = 33, 7, 2
    pts_q = jnp.asarray(rng.random((L, 2)), jnp.float32)
    pts_l = jnp.asarray(rng.random((Lt, 2)), jnp.float32)
    geom = TFGeometry(
        m_qry=pairwise_dist_half(pts_q, pts_q),
        m_cross=pairwise_dist_half(pts_q, pts_l),
        m_ltt=pairwise_dist_half(pts_l, pts_l),
    )
    geom_thr = tf_precompute_thresholds(geom, 25.0, 40.0)
    x = jnp.asarray(rng.random((B, L, 1)), jnp.float32)
    mesh = jnp.asarray(rng.random((L, 1)), jnp.float32)
    model = PiTTF(
        out_dim=1, hid_dim=8, n_head=2, locality_encoder=25.0,
        locality_decoder=40.0, n_blocks=1, bandwidth="tan",
    )
    params = model.init(jax.random.PRNGKey(2), geom, mesh, x)
    # force one negative and one positive bandwidth per attention module
    params = jax.tree_util.tree_map_with_path(
        lambda path, leaf: (
            jnp.asarray([[[-0.4]], [[0.7]]], jnp.float32)
            if any(getattr(k, "key", None) == "band_width" for k in path)
            and leaf.shape == (2, 1, 1)
            else leaf
        ),
        params,
    )
    out_quantile = model.apply(params, geom, mesh, x)
    out_thr = model.apply(params, geom_thr, mesh, x)
    np.testing.assert_allclose(
        np.asarray(out_thr), np.asarray(out_quantile), rtol=1e-6, atol=1e-7
    )


def test_pointcloud_setup_thresholds_match_in_call_quantile():
    """Per-sample percentile thresholds precomputed at setup produce the
    same forward as the in-call (B, L, L) quantile (setup_elasticity_tf)."""
    from position_induced_transformer_tpu.models import PiTTFPointCloud
    from position_induced_transformer_tpu.ops.locality import (
        batched_halfdist_percentile_thresholds,
    )

    rng = np.random.default_rng(7)
    B, L, in_dim = 2, 40, 6
    x = jnp.asarray(rng.random((B, L, in_dim)), jnp.float32)
    model = PiTTFPointCloud(
        out_dim=1, hid_dim=16, n_head=2,
        locality_encoder=5.0, locality_decoder=30.0, n_blocks=1,
    )
    params = model.init(jax.random.PRNGKey(0), x)
    want = model.apply(params, x)
    thr_en = batched_halfdist_percentile_thresholds(x[..., :2], 5.0)
    thr_de = batched_halfdist_percentile_thresholds(x[..., :2], 30.0)
    got = model.apply(params, x, thr_en, thr_de)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_pointcloud_shared_locality_single_threshold():
    """With locality_encoder == locality_decoder (the elasticity_tf
    config), passing ONLY thr_en must (a) resolve the threshold for both
    attention sites (same output as passing it twice / computing in-call)
    and (b) NOT count as a missing threshold — a last-wins dict literal
    used to silently rebuild the (B, L, L) distance matrix and drop the
    fused coordinate-kernel path in exactly this case."""
    from position_induced_transformer_tpu.models import PiTTFPointCloud
    from position_induced_transformer_tpu.models.pit_tf import (
        _given_thresholds,
    )
    from position_induced_transformer_tpu.ops.locality import (
        batched_halfdist_percentile_thresholds,
    )

    # decision logic: one given threshold covers both equal localities
    given = _given_thresholds(2.0, 2.0, "EN", None)
    assert given == {2.0: "EN"}
    assert _given_thresholds(2.0, 2.0, None, "DE") == {2.0: "DE"}
    # distinct localities keep their own entries (decoder one missing)
    assert _given_thresholds(5.0, 30.0, "EN", None) == {5.0: "EN", 30.0: None}

    rng = np.random.default_rng(3)
    B, L, in_dim = 2, 36, 6
    x = jnp.asarray(rng.random((B, L, in_dim)), jnp.float32)
    model = PiTTFPointCloud(
        out_dim=1, hid_dim=16, n_head=2,
        locality_encoder=2.0, locality_decoder=2.0, n_blocks=1,
    )
    params = model.init(jax.random.PRNGKey(0), x)
    thr = batched_halfdist_percentile_thresholds(x[..., :2], 2.0)
    want = model.apply(params, x, thr, thr)
    got_en_only = model.apply(params, x, thr, None)
    got_de_only = model.apply(params, x, None, thr)
    np.testing.assert_allclose(np.asarray(got_en_only), np.asarray(want))
    np.testing.assert_allclose(np.asarray(got_de_only), np.asarray(want))
