"""Fused Pallas kernel vs the pure-jnp oracle.

Runs in interpret mode on CPU (bit-level semantics of the kernel program);
the same assertions execute compiled on TPU when one is attached (see
scripts/tpu_checks.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from position_induced_transformer_tpu.kernels import position_attention_fixed
from position_induced_transformer_tpu.ops import (
    euclidean_sq,
    position_attention,
)

INTERPRET = jax.devices()[0].platform != "tpu"


@pytest.mark.parametrize("version", [1, 2, 3])
@pytest.mark.parametrize(
    "L_out,L_in,B,H,D,loc",
    [
        (64, 64, 2, 2, 8, 0.3),  # self-attention, masked
        (64, 64, 2, 1, 8, 1.0),  # global (processor blocks)
        (16, 200, 3, 2, 4, 0.1),  # cross, L_in not tile-aligned
        (100, 48, 2, 2, 16, 0.5),  # L_out not tile-aligned
    ],
)
def test_fused_matches_oracle(L_out, L_in, B, H, D, loc, version):
    rng = np.random.default_rng(0)
    mesh_out = jnp.asarray(rng.random((L_out, 2)), jnp.float32)
    mesh_in = jnp.asarray(rng.random((L_in, 2)), jnp.float32)
    dist = euclidean_sq(mesh_out, mesh_in)
    lmda = jnp.asarray(rng.standard_normal((H, 1, 1)), jnp.float32)
    u = jnp.asarray(rng.random((B, L_in, D)), jnp.float32)

    want = position_attention(dist, lmda, u, loc)
    got = position_attention_fixed(dist, lmda, u, loc, interpret=INTERPRET, version=version)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("fused_bwd", [False, True])
@pytest.mark.parametrize(
    "L_out,L_in,B,H,D,loc",
    [
        (48, 48, 2, 2, 8, 0.4),    # self, masked
        (16, 200, 3, 2, 4, 0.1),   # cross, unaligned L_in
        (100, 48, 2, 1, 16, 1.0),  # global, unaligned L_out
    ],
)
def test_fused_gradients_match_oracle(L_out, L_in, B, H, D, loc, fused_bwd):
    rng = np.random.default_rng(1)
    mesh_out = jnp.asarray(rng.random((L_out, 2)), jnp.float32)
    mesh_in = jnp.asarray(rng.random((L_in, 2)), jnp.float32)
    dist = euclidean_sq(mesh_out, mesh_in)
    lmda = jnp.asarray(rng.random((H, 1, 1)), jnp.float32)
    u = jnp.asarray(rng.random((B, L_in, D)), jnp.float32)

    def loss_ref(lmda, u):
        return jnp.sum(position_attention(dist, lmda, u, loc) ** 2)

    def loss_fused(lmda, u):
        return jnp.sum(
            position_attention_fixed(
                dist, lmda, u, loc, interpret=INTERPRET, fused_bwd=fused_bwd
            ) ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(lmda, u)
    g_fused = jax.grad(loss_fused, argnums=(0, 1))(lmda, u)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
        )


# ------------------------------------------------- batched (per-sample) kernel
@pytest.mark.parametrize(
    "B,Lq,Lk,H,D,loc",
    [
        (2, 64, 64, 2, 8, 0.1),    # self, masked (elasticity en/de)
        (2, 64, 64, 1, 8, 1.0),    # global (processor)
        (3, 37, 53, 2, 19, 0.1),   # cross, nothing tile-aligned
        (2, 300, 120, 1, 4, 0.02), # NACA-like: tiny keep count (c=3)
    ],
)
def test_batched_fused_matches_oracle(B, Lq, Lk, H, D, loc):
    from position_induced_transformer_tpu.kernels import (
        position_attention_batched,
    )
    from position_induced_transformer_tpu.ops.locality import topk_threshold

    rng = np.random.default_rng(2)
    mq = jnp.asarray(rng.random((B, Lq, 2)), jnp.float32)
    mk = jnp.asarray(rng.random((B, Lk, 2)), jnp.float32)
    lmda = jnp.asarray(rng.standard_normal((H, 1, 1)), jnp.float32)
    u = jnp.asarray(rng.random((B, Lk, D)), jnp.float32)

    dist = euclidean_sq(mq, mk)
    thr = topk_threshold(dist, loc) if loc < 1 else None
    want = position_attention(dist, lmda, u, loc, thr=thr)
    got = position_attention_batched(mq, mk, lmda, u, loc, interpret=INTERPRET)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )
    # precomputed-threshold variant (setup-time midpoint thresholds):
    # identical keep mask, same output
    from position_induced_transformer_tpu.ops.locality import (
        batched_topk_thresholds,
    )

    thr_pre = batched_topk_thresholds(mq, mk, loc)
    got_thr = position_attention_batched(
        mq, mk, lmda, u, loc, thr_pre, interpret=INTERPRET
    )
    np.testing.assert_allclose(
        np.asarray(got_thr), np.asarray(want), rtol=2e-5, atol=2e-6
    )


@pytest.mark.parametrize(
    "B,Lq,Lk,H,D,loc",
    [
        (2, 48, 48, 2, 8, 0.1),
        (3, 37, 53, 1, 19, 0.1),
        (2, 100, 48, 2, 16, 1.0),
    ],
)
def test_batched_fused_gradients_match_oracle(B, Lq, Lk, H, D, loc):
    from position_induced_transformer_tpu.kernels import (
        position_attention_batched,
    )
    from position_induced_transformer_tpu.ops.locality import topk_threshold

    rng = np.random.default_rng(3)
    mq = jnp.asarray(rng.random((B, Lq, 2)), jnp.float32)
    mk = jnp.asarray(rng.random((B, Lk, 2)), jnp.float32)
    lmda = jnp.asarray(rng.random((H, 1, 1)), jnp.float32)
    u = jnp.asarray(rng.random((B, Lk, D)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((B, Lq, H * D)), jnp.float32)

    def fused(lm, uu):
        return jnp.sum(
            position_attention_batched(mq, mk, lm, uu, loc, interpret=INTERPRET)
            * ct
        )

    def oracle(lm, uu):
        dist = euclidean_sq(mq, mk)
        thr = topk_threshold(dist, loc) if loc < 1 else None
        return jnp.sum(position_attention(dist, lm, uu, loc, thr=thr) * ct)

    g1 = jax.grad(fused, argnums=(0, 1))(lmda, u)
    g2 = jax.grad(oracle, argnums=(0, 1))(lmda, u)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-6
        )


def test_lazy_geometry_model_parity():
    """A PiT bound to lazy per-sample geometry (XLA fallback path on CPU)
    produces the same output as the same params bound to eager distances."""
    from position_induced_transformer_tpu.models import PiT, build_geometry

    rng = np.random.default_rng(4)
    B, L = 3, 48
    mesh = jnp.asarray(rng.random((B, L, 2)), jnp.float32)
    x = jnp.asarray(rng.random((B, L, 5)), jnp.float32)
    model = PiT(
        space_dim=2, in_dim=5, out_dim=1, hid_dim=16, n_head=2, n_blocks=2,
        en_loc=0.1, de_loc=0.1, concat_mesh=False,
    )
    lazy = build_geometry(mesh, mesh, mesh, en_loc=0.1, de_loc=0.1, lazy=True)
    eager = build_geometry(
        mesh, mesh, mesh, en_loc=0.1, de_loc=0.1, threshold_impl="topk"
    )
    params = model.init(jax.random.PRNGKey(0), lazy, x)
    out_lazy = model.apply(params, lazy, x)
    out_eager = model.apply(params, eager, x)
    np.testing.assert_allclose(
        np.asarray(out_lazy), np.asarray(out_eager), rtol=1e-6, atol=1e-7
    )


def test_batched_fused_large_keep_count_falls_back_to_external_threshold():
    """locality keeping >32 neighbors must not unroll hundreds of min
    passes in-kernel: the wrapper computes the threshold outside and the
    result still matches the oracle."""
    from position_induced_transformer_tpu.kernels import (
        position_attention_batched,
    )
    from position_induced_transformer_tpu.ops.locality import topk_threshold

    rng = np.random.default_rng(5)
    B, Lq, Lk, H, D, loc = 2, 64, 100, 2, 8, 0.5  # keep_count = 50 > 32
    mq = jnp.asarray(rng.random((B, Lq, 2)), jnp.float32)
    mk = jnp.asarray(rng.random((B, Lk, 2)), jnp.float32)
    lmda = jnp.asarray(rng.standard_normal((H, 1, 1)), jnp.float32)
    u = jnp.asarray(rng.random((B, Lk, D)), jnp.float32)

    dist = euclidean_sq(mq, mk)
    want = position_attention(dist, lmda, u, loc, thr=topk_threshold(dist, loc))
    got = position_attention_batched(mq, mk, lmda, u, loc, interpret=INTERPRET)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )


@pytest.mark.parametrize(
    "B,Lo,Li,H,V,use_thr",
    [
        (2, 50, 40, 8, 8, True),   # elasticity_tf-like head count
        (2, 37, 37, 2, 16, False),  # global (processor blocks), unaligned
        (1, 300, 130, 4, 4, True),  # multiple row tiles
    ],
)
def test_tf_batched_dist_kernel_matches_oracle(B, Lo, Li, H, V, use_thr):
    """TF-semantics fused kernel over pre-built distances: forward and
    (scale, values) gradients match the materializing XLA oracle."""
    from position_induced_transformer_tpu.kernels import (
        position_attention_batched_dist,
    )

    rng = np.random.default_rng(3)
    dist = jnp.asarray(rng.random((B, Lo, Li)), jnp.float32)
    scales = jnp.asarray(rng.random((H, 1)), jnp.float32)
    values = jnp.asarray(rng.standard_normal((B, Li, H * V)), jnp.float32)
    thr = (
        jnp.quantile(dist, 0.3, axis=-1, keepdims=True) if use_thr else None
    )

    def oracle(scales, values):
        scaled = dist[:, None] * scales[None, :, :, None]
        if thr is not None:
            keep = (dist <= thr)[:, None]
            scaled = jnp.where(keep, scaled, jnp.finfo(jnp.float32).max)
        att = jax.nn.softmax(-scaled, axis=-1)
        v = values.reshape(B, Li, H, V).transpose(0, 2, 1, 3)
        out = jnp.einsum("bhnj,bhjd->bhnd", att, v)
        return out.transpose(0, 2, 1, 3).reshape(B, Lo, H * V)

    want = oracle(scales, values)
    got = position_attention_batched_dist(
        dist, scales, values, thr, interpret=INTERPRET
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )

    loss_o = lambda s, v: jnp.sum(oracle(s, v) ** 2)
    loss_k = lambda s, v: jnp.sum(
        position_attention_batched_dist(
            dist, s, v, thr, interpret=INTERPRET
        )
        ** 2
    )
    go = jax.grad(loss_o, argnums=(0, 1))(scales, values)
    gk = jax.grad(loss_k, argnums=(0, 1))(scales, values)
    for a, b in zip(go, gk):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_tf_batched_dist_kernel_padded_rows_large_scale_finite():
    """Regression: padded rows (L_out not a tile multiple) with L_in a
    multiple of 128 and head scales > 1 must not produce NaN gradients
    (-_TF_BIG * s overflows to -inf without the row-validity mask)."""
    from position_induced_transformer_tpu.kernels import (
        position_attention_batched_dist,
    )

    rng = np.random.default_rng(0)
    B, L, H, V = 1, 384, 2, 8  # global attention, no column padding
    dist = jnp.asarray(rng.random((B, L, L)), jnp.float32)
    scales = jnp.full((H, 1), 1.5, jnp.float32)
    vals = jnp.asarray(rng.standard_normal((B, L, H * V)), jnp.float32)

    out = position_attention_batched_dist(
        dist, scales, vals, None, interpret=INTERPRET
    )
    assert bool(jnp.all(jnp.isfinite(out)))
    g = jax.grad(
        lambda s, v: jnp.sum(
            position_attention_batched_dist(
                dist, s, v, None, interpret=INTERPRET
            )
            ** 2
        ),
        argnums=(0, 1),
    )(scales, vals)
    assert bool(jnp.all(jnp.isfinite(g[0])))
    assert bool(jnp.all(jnp.isfinite(g[1])))


def test_batched_kernel_data_sharded_matches_unsharded():
    """PRODUCTION data-parallel mesh over the batched kernels: operands
    batch-sharded over a 'data' mesh run per-shard via the
    custom_partitioning rules (kernels/partitioning.py) and reproduce the
    unsharded forward AND gradients (the per-sample dScale reduction
    crosses shards through GSPMD's all-reduce of the outer jnp.sum)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from position_induced_transformer_tpu.kernels import (
        position_attention_batched,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 (fake) devices")
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    shard = NamedSharding(mesh, P("data"))

    rng = np.random.default_rng(7)
    B, Lq, Lk, H, D, loc = 8, 40, 56, 2, 16, 0.1
    mq = jnp.asarray(rng.random((B, Lq, 2)), jnp.float32)
    mk = jnp.asarray(rng.random((B, Lk, 2)), jnp.float32)
    lmda = jnp.asarray(rng.random((H, 1, 1)), jnp.float32)
    u = jnp.asarray(rng.random((B, Lk, D)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((B, Lq, H * D)), jnp.float32)

    def loss(lm, uu, mq_, mk_, ct_):
        return jnp.sum(
            position_attention_batched(
                mq_, mk_, lm, uu, loc, interpret=INTERPRET
            )
            * ct_
        )

    want = jax.jit(loss)(lmda, u, mq, mk, ct)
    gw = jax.jit(jax.grad(loss, argnums=(0, 1)))(lmda, u, mq, mk, ct)

    mq_s, mk_s, u_s, ct_s = (
        jax.device_put(a, shard) for a in (mq, mk, u, ct)
    )
    got = jax.jit(loss)(lmda, u_s, mq_s, mk_s, ct_s)
    gg = jax.jit(jax.grad(loss, argnums=(0, 1)))(lmda, u_s, mq_s, mk_s, ct_s)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)
    for a, b in zip(gg, gw):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-6
        )


def test_partitioning_tolerates_undecodable_shardings():
    """custom_partitioning callbacks can receive GSPMDSharding objects
    (no .spec attribute) instead of NamedSharding — e.g. when no named
    mesh is recoverable. _batch_axis must degrade to 'unsharded' instead
    of raising (an AttributeError in the legacy-GSPMD infer callback
    aborts the whole process inside XLA's ShardingPropagation)."""
    from position_induced_transformer_tpu.kernels.partitioning import (
        _batch_axis,
        _batch_operands,
    )

    class _OpaqueSharding:  # no .spec, like GSPMDSharding
        pass

    class _Info:
        sharding = _OpaqueSharding()
        ndim = 3

    assert _batch_axis([_Info(), _Info()], frozenset({0, 1})) is None

    # rule parsing: batch operands are those whose first factor is 'b'
    ops = _batch_operands(
        "b lo d, b li d, h one, b li f, b lo uno -> b lo g"
    )
    assert ops == frozenset({0, 1, 3, 4})


def test_batched_kernel_thr_data_sharded_matches_unsharded():
    """The *_thr partitioned variants — the production NACA path with
    setup-time per-sample thresholds under mesh='data=N' — also reproduce
    the unsharded forward and gradients (the thr operand is batch-leading
    (B, L_out, 1) and must shard with the batch)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from position_induced_transformer_tpu.kernels import (
        position_attention_batched,
    )
    from position_induced_transformer_tpu.ops.locality import (
        batched_topk_thresholds,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 (fake) devices")
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    shard = NamedSharding(mesh, P("data"))

    rng = np.random.default_rng(11)
    B, Lq, Lk, H, D, loc = 8, 40, 56, 2, 16, 0.1
    mq = jnp.asarray(rng.random((B, Lq, 2)), jnp.float32)
    mk = jnp.asarray(rng.random((B, Lk, 2)), jnp.float32)
    lmda = jnp.asarray(rng.random((H, 1, 1)), jnp.float32)
    u = jnp.asarray(rng.random((B, Lk, D)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((B, Lq, H * D)), jnp.float32)
    thr = batched_topk_thresholds(mq, mk, loc)

    def loss(lm, uu, mq_, mk_, ct_, thr_):
        return jnp.sum(
            position_attention_batched(
                mq_, mk_, lm, uu, loc, thr_, interpret=INTERPRET
            )
            * ct_
        )

    want = jax.jit(loss)(lmda, u, mq, mk, ct, thr)
    gw = jax.jit(jax.grad(loss, argnums=(0, 1)))(lmda, u, mq, mk, ct, thr)

    mq_s, mk_s, u_s, ct_s, thr_s = (
        jax.device_put(a, shard) for a in (mq, mk, u, ct, thr)
    )
    got = jax.jit(loss)(lmda, u_s, mq_s, mk_s, ct_s, thr_s)
    gg = jax.jit(jax.grad(loss, argnums=(0, 1)))(
        lmda, u_s, mq_s, mk_s, ct_s, thr_s
    )
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)
    for a, b in zip(gg, gw):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-6
        )


def test_tf_batched_kernel_data_sharded_matches_unsharded():
    """Same partitioning contract for the TF-semantics kernel over
    pre-built per-sample distances."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from position_induced_transformer_tpu.kernels import (
        position_attention_batched_dist,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 (fake) devices")
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    shard = NamedSharding(mesh, P("data"))

    rng = np.random.default_rng(8)
    B, Lo, Li, H, V = 4, 24, 40, 2, 8
    dist = jnp.asarray(rng.random((B, Lo, Li)), jnp.float32)
    scales = jnp.asarray(rng.random((H, 1)), jnp.float32)
    vals = jnp.asarray(rng.standard_normal((B, Li, H * V)), jnp.float32)

    def loss(s, v, d):
        return jnp.sum(
            position_attention_batched_dist(d, s, v, None, interpret=INTERPRET)
            ** 2
        )

    want = jax.jit(loss)(scales, vals, dist)
    gw = jax.jit(jax.grad(loss, argnums=(0, 1)))(scales, vals, dist)
    dist_s, vals_s = jax.device_put(dist, shard), jax.device_put(vals, shard)
    got = jax.jit(loss)(scales, vals_s, dist_s)
    gg = jax.jit(jax.grad(loss, argnums=(0, 1)))(scales, vals_s, dist_s)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)
    for a, b in zip(gg, gw):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-6
        )


# ------------------------------------------------- kept-column band skip
def _banded_case(B, Lq, Lk, loc, seed=11):
    """Spatially-ORDERED meshes (keys sorted along x, like the NACA C-grid
    latent slice) so the kept columns of each row tile form a narrow
    band. Returns (mq, mk, thr, band)."""
    from position_induced_transformer_tpu.kernels import band_tile_rows
    from position_induced_transformer_tpu.ops.locality import (
        batched_band_starts,
        batched_topk_thresholds,
    )

    rng = np.random.default_rng(seed)
    # sorted x plus small y jitter: index order == spatial order
    kx = np.sort(rng.random((B, Lk)), axis=-1)
    qx = np.sort(rng.random((B, Lq)), axis=-1)
    mk = jnp.asarray(
        np.stack([kx, 0.05 * rng.random((B, Lk))], -1), jnp.float32
    )
    mq = jnp.asarray(
        np.stack([qx, 0.05 * rng.random((B, Lq))], -1), jnp.float32
    )
    thr = batched_topk_thresholds(mq, mk, loc)
    band = batched_band_starts(mq, mk, thr, band_tile_rows(Lq))
    return mq, mk, thr, band


def test_band_starts_cover_all_kept_columns():
    """The setup-time contract the kernel relies on: every kept column of
    every row lies inside its tile's [start, start+width) band, starts are
    8-aligned and the band stays inside the 128-padded key axis."""
    from position_induced_transformer_tpu.kernels import band_tile_rows

    B, Lq, Lk, loc = 2, 1200, 520, 0.02
    mq, mk, thr, band = _banded_case(B, Lq, Lk, loc)
    assert band is not None, "ordered mesh must yield a band"
    starts, width = np.asarray(band[0]), band[1]
    tlo = band_tile_rows(Lq)
    assert starts.shape == (B, -(-Lq // tlo))
    assert width % 128 == 0 and (starts % 8 == 0).all()
    Lk_pad = -(-Lk // 128) * 128
    assert (starts >= 0).all() and (starts + width <= Lk_pad).all()
    keep = np.asarray(euclidean_sq(mq, mk)) <= np.asarray(thr)
    for b in range(B):
        for i in range(starts.shape[1]):
            cols = np.where(keep[b, i * tlo : (i + 1) * tlo].any(0))[0]
            assert cols.size
            assert cols.min() >= starts[b, i]
            assert cols.max() < starts[b, i] + width


def test_band_starts_none_for_incoherent_ordering():
    """Randomly-ordered point clouds (elasticity) span the full key axis;
    the helper must decline so callers fall back to full-width tiles."""
    from position_induced_transformer_tpu.kernels import band_tile_rows
    from position_induced_transformer_tpu.ops.locality import (
        batched_band_starts,
        batched_topk_thresholds,
    )

    rng = np.random.default_rng(5)
    B, Lq, Lk, loc = 2, 600, 520, 0.02
    mq = jnp.asarray(rng.random((B, Lq, 2)), jnp.float32)
    mk = jnp.asarray(rng.random((B, Lk, 2)), jnp.float32)
    thr = batched_topk_thresholds(mq, mk, loc)
    assert batched_band_starts(mq, mk, thr, band_tile_rows(Lq)) is None


@pytest.mark.parametrize("B,Lq,Lk,loc", [(2, 1200, 520, 0.02)])
def test_band_kernel_matches_oracle(B, Lq, Lk, loc):
    from position_induced_transformer_tpu.kernels import (
        BandSpec,
        position_attention_batched,
    )

    rng = np.random.default_rng(13)
    H, D = 2, 8
    mq, mk, thr, band = _banded_case(B, Lq, Lk, loc)
    assert band is not None
    lmda = jnp.asarray(rng.standard_normal((H, 1, 1)), jnp.float32)
    u = jnp.asarray(rng.random((B, Lk, D)), jnp.float32)

    want = position_attention(euclidean_sq(mq, mk), lmda, u, loc, thr=thr)
    got = position_attention_batched(
        mq, mk, lmda, u, loc, thr, BandSpec(*band), interpret=INTERPRET
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )


def test_band_kernel_gradients_match_oracle():
    from position_induced_transformer_tpu.kernels import (
        BandSpec,
        position_attention_batched,
    )

    rng = np.random.default_rng(17)
    B, Lq, Lk, H, D, loc = 2, 700, 384, 1, 8, 0.03
    mq, mk, thr, band = _banded_case(B, Lq, Lk, loc, seed=19)
    assert band is not None
    lmda = jnp.asarray(rng.random((H, 1, 1)), jnp.float32)
    u = jnp.asarray(rng.random((B, Lk, D)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((B, Lq, H * D)), jnp.float32)
    spec = BandSpec(*band)

    def fused(lm, uu):
        return jnp.sum(
            position_attention_batched(
                mq, mk, lm, uu, loc, thr, spec, interpret=INTERPRET
            )
            * ct
        )

    def oracle(lm, uu):
        return jnp.sum(
            position_attention(euclidean_sq(mq, mk), lm, uu, loc, thr=thr)
            * ct
        )

    g1 = jax.grad(fused, argnums=(0, 1))(lmda, u)
    g2 = jax.grad(oracle, argnums=(0, 1))(lmda, u)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-6
        )


def test_band_kernel_data_sharded_matches_unsharded():
    """Band variant of the custom_partitioning rules: the per-(sample,
    tile) starts shard with the batch like every other operand."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from position_induced_transformer_tpu.kernels import (
        BandSpec,
        position_attention_batched,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 (fake) devices")
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    shard = NamedSharding(mesh, P("data"))

    rng = np.random.default_rng(23)
    B, Lq, Lk, H, D, loc = 4, 600, 384, 2, 8, 0.03
    mq, mk, thr, band = _banded_case(B, Lq, Lk, loc, seed=29)
    assert band is not None
    starts, width = band
    lmda = jnp.asarray(rng.random((H, 1, 1)), jnp.float32)
    u = jnp.asarray(rng.random((B, Lk, D)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((B, Lq, H * D)), jnp.float32)

    def loss(lm, uu, mq_, mk_, thr_, st_, ct_):
        return jnp.sum(
            position_attention_batched(
                mq_, mk_, lm, uu, loc, thr_, BandSpec(st_, width),
                interpret=INTERPRET,
            )
            * ct_
        )

    want = jax.jit(loss)(lmda, u, mq, mk, thr, starts, ct)
    gw = jax.jit(jax.grad(loss, argnums=(0, 1)))(
        lmda, u, mq, mk, thr, starts, ct
    )
    mq_s, mk_s, thr_s, st_s, u_s, ct_s = (
        jax.device_put(a, shard) for a in (mq, mk, thr, starts, u, ct)
    )
    got = jax.jit(loss)(lmda, u_s, mq_s, mk_s, thr_s, st_s, ct_s)
    gg = jax.jit(jax.grad(loss, argnums=(0, 1)))(
        lmda, u_s, mq_s, mk_s, thr_s, st_s, ct_s
    )
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)
    for a, b in zip(gg, gw):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-6
        )


def _ring_case(B, Lq, Lk, loc, seed=31):
    """Angle-sorted point clouds on a closed curve: kept columns WRAP at
    the index seam — the circular-band case (elasticity annulus)."""
    from position_induced_transformer_tpu.kernels import band_tile_rows
    from position_induced_transformer_tpu.ops.locality import (
        batched_band_starts,
        batched_topk_thresholds,
    )

    rng = np.random.default_rng(seed)
    th_k = np.sort(rng.uniform(0, 2 * np.pi, (B, Lk)), axis=1)
    th_q = np.sort(rng.uniform(0, 2 * np.pi, (B, Lq)), axis=1)
    rad = 1.0 + 0.1 * rng.random((B, 1))
    mk = jnp.asarray(
        np.stack([rad * np.cos(th_k), rad * np.sin(th_k)], -1), jnp.float32
    )
    mq = jnp.asarray(
        np.stack([rad * np.cos(th_q), rad * np.sin(th_q)], -1), jnp.float32
    )
    thr = batched_topk_thresholds(mq, mk, loc)
    band = batched_band_starts(
        mq, mk, thr, band_tile_rows(Lq), circular=True
    )
    return mq, mk, thr, band


def test_circular_band_covers_seam_and_matches_oracle():
    """Rows near the index seam keep columns at BOTH ends of the key
    axis; the circular band (wrap margin) must still reproduce the
    oracle exactly — including gradients through the duplicated keys."""
    from position_induced_transformer_tpu.kernels import (
        BandSpec,
        position_attention_batched,
    )

    B, Lq, Lk, H, D, loc = 2, 900, 700, 2, 8, 0.02
    mq, mk, thr, band = _ring_case(B, Lq, Lk, loc)
    assert band is not None, "ring cloud must yield a circular band"
    starts, width, wrap = band
    assert wrap == width and width < Lk
    # the seam tile genuinely wraps: some start + width exceeds Lk
    assert (np.asarray(starts) + width > Lk).any()
    spec = BandSpec(starts, width, wrap)

    rng = np.random.default_rng(37)
    lmda = jnp.asarray(rng.standard_normal((H, 1, 1)), jnp.float32)
    u = jnp.asarray(rng.random((B, Lk, D)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((B, Lq, H * D)), jnp.float32)

    want = position_attention(euclidean_sq(mq, mk), lmda, u, loc, thr=thr)
    got = position_attention_batched(
        mq, mk, lmda, u, loc, thr, spec, interpret=INTERPRET
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )

    def fused(lm, uu):
        return jnp.sum(
            position_attention_batched(
                mq, mk, lm, uu, loc, thr, spec, interpret=INTERPRET
            )
            * ct
        )

    def oracle(lm, uu):
        return jnp.sum(
            position_attention(euclidean_sq(mq, mk), lm, uu, loc, thr=thr)
            * ct
        )

    g1 = jax.grad(fused, argnums=(0, 1))(lmda, u)
    g2 = jax.grad(oracle, argnums=(0, 1))(lmda, u)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-6
        )


def test_elasticity_setup_band_model_parity():
    """setup_elasticity's angular sort + circular band: geometry carries
    one thr/band pair for encoder+decoder, and (on the CPU XLA path,
    which ignores the band) forward matches the band-less geometry."""
    import dataclasses as dc

    from position_induced_transformer_tpu import configs
    from position_induced_transformer_tpu.train import benchmarks

    p = benchmarks.setup_elasticity(configs.get("elasticity"), ntrain=8,
                                    ntest=4)
    assert "band" in p.train_data and "thr" in p.train_data
    batch = {k: v[:4] for k, v in p.train_data.items()}
    g = p.task.geom_fn(batch)
    assert g.band_up is not None and g.band_up.wrap == g.band_up.width
    params = p.model.init(jax.random.PRNGKey(0), g, batch["x"])
    out = jax.jit(p.model.apply)(params, g, batch["x"])
    g2 = dc.replace(g, band_down=None, band_up=None)
    out2 = jax.jit(p.model.apply)(params, g2, batch["x"])
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out2), rtol=2e-5, atol=1e-6
    )


# -------------------------------------- TF-semantics coordinate kernel
def test_tf_coord_kernel_matches_oracle_and_dist_kernel():
    """position_attention_batched_tf_coords (in-kernel dist^2/2) vs the
    XLA oracle AND the pre-built-dist kernel: same math, no HBM dist."""
    from position_induced_transformer_tpu.kernels import (
        position_attention_batched_dist,
        position_attention_batched_tf_coords,
    )
    from position_induced_transformer_tpu.ops.locality import (
        quantile_threshold,
    )

    rng = np.random.default_rng(41)
    B, L, H, V = 3, 200, 4, 16
    c = jnp.asarray(rng.random((B, L, 2)), jnp.float32)
    diff = c[:, :, None, :] - c[:, None, :, :]
    dist = 0.5 * jnp.sum(diff * diff, axis=-1)
    scales = jnp.asarray(rng.random((H, 1)) + 0.1, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, H * V)), jnp.float32)

    for pct in (2.0, None):  # local and global
        thr = quantile_threshold(dist, pct / 100.0) if pct else None
        want = position_attention_batched_dist(
            dist, scales, v, thr, interpret=INTERPRET
        )
        got = position_attention_batched_tf_coords(
            c, c, scales, v, thr, interpret=INTERPRET
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
        )


def test_tf_coord_kernel_gradients_match_dist_kernel():
    from position_induced_transformer_tpu.kernels import (
        position_attention_batched_dist,
        position_attention_batched_tf_coords,
    )
    from position_induced_transformer_tpu.ops.locality import (
        quantile_threshold,
    )

    rng = np.random.default_rng(43)
    B, L, H, V = 2, 150, 2, 8
    c = jnp.asarray(rng.random((B, L, 2)), jnp.float32)
    diff = c[:, :, None, :] - c[:, None, :, :]
    dist = 0.5 * jnp.sum(diff * diff, axis=-1)
    thr = quantile_threshold(dist, 0.03)
    scales = jnp.asarray(rng.random((H, 1)) + 0.1, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, H * V)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((B, L, H * V)), jnp.float32)

    g1 = jax.grad(
        lambda s, vv: jnp.sum(
            position_attention_batched_tf_coords(
                c, c, s, vv, thr, interpret=INTERPRET
            ) * ct
        ),
        argnums=(0, 1),
    )(scales, v)
    g2 = jax.grad(
        lambda s, vv: jnp.sum(
            position_attention_batched_dist(
                dist, s, vv, thr, interpret=INTERPRET
            ) * ct
        ),
        argnums=(0, 1),
    )(scales, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-6
        )


def test_tf_coord_kernel_circular_band():
    """Circular band on an angle-sorted ring cloud through the TF
    coordinate kernel (the elasticity_tf production config), incl. the
    dValues adjoint through the duplicated wrap margin."""
    from position_induced_transformer_tpu.kernels import (
        BandSpec,
        band_tile_rows,
        position_attention_batched_dist,
        position_attention_batched_tf_coords,
    )
    from position_induced_transformer_tpu.ops.locality import (
        batched_band_starts,
        batched_halfdist_percentile_thresholds,
    )

    rng = np.random.default_rng(47)
    B, L, H, V = 2, 900, 2, 8
    th = np.sort(rng.uniform(0, 2 * np.pi, (B, L)), axis=1)
    rad = 1.0 + 0.05 * rng.random((B, L))
    c = jnp.asarray(
        np.stack([rad * np.cos(th), rad * np.sin(th)], -1), jnp.float32
    )
    thr = batched_halfdist_percentile_thresholds(c, 2.0)
    band = batched_band_starts(
        c, c, 2.0 * thr, band_tile_rows(L), circular=True
    )
    assert band is not None
    spec = BandSpec(*band)
    assert (np.asarray(spec.starts) + spec.width > L).any()  # seam tiles

    diff = c[:, :, None, :] - c[:, None, :, :]
    dist = 0.5 * jnp.sum(diff * diff, axis=-1)
    scales = jnp.asarray(rng.random((H, 1)) + 0.1, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, H * V)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((B, L, H * V)), jnp.float32)

    want = position_attention_batched_dist(
        dist, scales, v, thr, interpret=INTERPRET
    )
    got = position_attention_batched_tf_coords(
        c, c, scales, v, thr, spec, interpret=INTERPRET
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )
    g1 = jax.grad(
        lambda s, vv: jnp.sum(
            position_attention_batched_tf_coords(
                c, c, s, vv, thr, spec, interpret=INTERPRET
            ) * ct
        ),
        argnums=(0, 1),
    )(scales, v)
    g2 = jax.grad(
        lambda s, vv: jnp.sum(
            position_attention_batched_dist(
                dist, s, vv, thr, interpret=INTERPRET
            ) * ct
        ),
        argnums=(0, 1),
    )(scales, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-6
        )


def test_elasticity_tf_setup_band_and_sorted_model_parity():
    """setup_elasticity_tf: angular sort + circular bands in the data
    dict; sorting is EXACT (same final metrics as the unsorted setup on
    the CPU XLA path, which ignores coords/band)."""
    import os

    from position_induced_transformer_tpu import configs
    from position_induced_transformer_tpu.train import benchmarks

    cfg = configs.get("elasticity_tf")
    p = benchmarks.setup_elasticity_tf(cfg, ntrain=8, ntest=4)
    assert "band_en" in p.train_data and "band_de" in p.train_data
    g = p.task.geom_fn({k: v[:4] for k, v in p.train_data.items()})
    assert g["band_en"] is not None and g["band_en"].wrap > 0

    # exactness of the permutation: the model is permutation-equivariant
    # over points (attention over all pairs + pointwise layers), so
    # sorted inputs produce exactly the sorted outputs of the unsorted
    # setup (full-width training parity is covered on-chip; a CPU
    # full-width elasticity_tf train is minutes per epoch)
    prev_band = os.environ.get("PIT_ELASTICITY_BAND")
    os.environ["PIT_ELASTICITY_BAND"] = "0"
    try:
        p_plain = benchmarks.setup_elasticity_tf(cfg, ntrain=8, ntest=4)
    finally:
        if prev_band is None:
            os.environ.pop("PIT_ELASTICITY_BAND")
        else:
            os.environ["PIT_ELASTICITY_BAND"] = prev_band
    from position_induced_transformer_tpu.data.meshes import (
        angular_sort_perm,
    )

    xs = p.train_data["x"][:2]
    xp = p_plain.train_data["x"][:2]
    perm = angular_sort_perm(np.asarray(xp[..., :2]))[:2]
    np.testing.assert_allclose(
        np.asarray(xs),
        np.take_along_axis(np.asarray(xp), perm[..., None], 1),
    )
    params = p.model.init(jax.random.PRNGKey(0), xs)
    out_s = jax.jit(p.model.apply)(params, xs)
    out_p = jax.jit(p_plain.model.apply)(params, xp)
    np.testing.assert_allclose(
        np.asarray(out_s),
        np.take_along_axis(np.asarray(out_p), perm[..., None], 1),
        rtol=2e-5, atol=2e-5,
    )


def test_batched_extreme_bandwidth_no_dead_rows():
    """Saturated learned bandwidth (sin(lmda) -> 1, scale ~ 3e9): every
    kept logit would underflow exp without the per-row kept-min shift
    (_row_min_kept), silently zeroing rows AND their cotangents. The
    kernel must instead degrade like the reference's max-subtracted
    softmax: ~one-hot at the nearest kept column, nonzero outputs,
    nonzero dValues. Regression for the no-shift _attention variant."""
    from position_induced_transformer_tpu.kernels import (
        position_attention_batched,
    )
    from position_induced_transformer_tpu.ops.locality import topk_threshold
    from position_induced_transformer_tpu.ops.posatt import bandwidth_scale

    rng = np.random.default_rng(5)
    B, Lq, Lk, H, D, loc = 2, 32, 48, 2, 8, 0.2
    mq = jnp.asarray(rng.random((B, Lq, 2)), jnp.float32)
    mk = jnp.asarray(rng.random((B, Lk, 2)), jnp.float32)
    u = jnp.asarray(rng.random((B, Lk, D)), jnp.float32)
    # lmda ~ pi/2: scale = tan(pi/4 (1+sin lmda)) saturates to ~3e9
    lmda = jnp.full((H, 1, 1), 1.5707, jnp.float32)
    s = float(bandwidth_scale(lmda)[0, 0, 0])
    dist = euclidean_sq(mq, mk)
    assert s * float(jnp.min(dist)) > 200.0  # genuinely in the regime

    want = position_attention(dist, lmda, u, loc)  # jax.nn.softmax path
    got = position_attention_batched(mq, mk, lmda, u, loc, interpret=INTERPRET)
    # no dead rows, and the one-hot limit agrees with the oracle
    assert float(jnp.min(jnp.max(jnp.abs(got), axis=-1))) > 1e-6
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )

    # cotangent flows: dValues must be nonzero (it was exactly zero with
    # the underflowed no-shift softmax)
    gfun = jax.grad(
        lambda uu: jnp.sum(
            position_attention_batched(mq, mk, lmda, uu, loc,
                                       interpret=INTERPRET)
        )
    )
    gref = jax.grad(
        lambda uu: jnp.sum(position_attention(dist, lmda, uu, loc))
    )
    du, du_ref = gfun(u), gref(u)
    assert float(jnp.max(jnp.abs(du))) > 1e-3
    np.testing.assert_allclose(
        np.asarray(du), np.asarray(du_ref), rtol=2e-4, atol=2e-5
    )
