"""Per-benchmark problem setup: data -> meshes -> Geometry -> Task.

Each ``setup_<name>`` returns a :class:`Problem` that the unified runner
consumes. This replaces the bespoke glue in each reference driver script
(mesh construction, normalization placement, latent-mesh selection) with
data declared next to the config.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from position_induced_transformer_tpu.configs import BenchmarkConfig
from position_induced_transformer_tpu.data import loaders, meshes
from position_induced_transformer_tpu.models import (
    Geometry,
    PiT,
    build_geometry,
    build_geometry_host,
)
from position_induced_transformer_tpu.ops.normalization import PixelWiseNormalizer
from position_induced_transformer_tpu.train.loop import Task


@dataclasses.dataclass
class Problem:
    config: BenchmarkConfig
    model: PiT
    task: Task
    geom: Optional[Geometry]  # static geometry (None for per-sample meshes)
    train_data: Dict[str, jnp.ndarray]
    test_data: Dict[str, jnp.ndarray]
    n_train: int
    n_test: int
    x_normalizer: Optional[PixelWiseNormalizer] = None
    y_normalizer: Optional[PixelWiseNormalizer] = None
    extras: Dict[str, Any] = dataclasses.field(default_factory=dict)
    init_fn: Optional[Callable] = None  # (rng, sample_data) -> variables,
    # for models whose call signature differs from (geom, x)


# model_variant -> (processor_attention, coder_attention) for the TF family
# (reference ablations: tensorflow/1_InviscidBurgers/train.py:38-40,
# utils.py:230-553 — each dir's PiT with attention modules swapped)
_VARIANT_ATTENTION = {
    "pit": ("position", "position"),
    "lite": ("self", "position"),
    "transformer": ("self", "self"),
    "selfpit": ("hybrid", "hybrid"),
}


def _variant_attention(cfg: BenchmarkConfig, point_cloud: bool = False) -> dict:
    """Attention-kind kwargs for PiTTF/PiTTFPointCloud from the config's
    ``model_variant``; validates the variant against the benchmark."""
    v = cfg.model_variant or "pit"
    if v not in _VARIANT_ATTENTION:
        raise ValueError(
            f"unknown model variant {v!r}; available: "
            f"{sorted(_VARIANT_ATTENTION)}"
        )
    if point_cloud and v == "selfpit":
        raise ValueError(
            "the 'selfpit' variant is not defined for the point-cloud "
            "family (the reference has no SelfPiT in 5_Elasticity)"
        )
    if v == "selfpit" and (
        cfg.grid is None
        or cfg.latent_grid is None
        or tuple(cfg.grid) != tuple(cfg.latent_grid)
    ):
        raise ValueError(
            "the 'selfpit' variant requires latent == query resolution "
            "(its hybrid attention mixes dot-product logits with the "
            "distance bias; reference SelfPiT lives in "
            "tensorflow/1_InviscidBurgers where ltt_res == qry_res)"
        )
    pa, ca = _VARIANT_ATTENTION[v]
    # compute_dtype rides along: every PiTTF/PiTTFPointCloud construction
    # site passes **_variant_attention(cfg), so the mixed-precision knob
    # reaches all six TF-family benchmarks through one place
    return {
        "processor_attention": pa,
        "coder_attention": ca,
        "compute_dtype": cfg.model.compute_dtype,
    }


def _make_model(cfg: BenchmarkConfig) -> PiT:
    if (cfg.model_variant or "pit") != "pit":
        raise ValueError(
            f"model variant {cfg.model_variant!r} exists for the TF-family "
            "benchmarks only (the reference's ablation baselines live in "
            "tensorflow/*/utils.py; the torch implementation has none)"
        )
    m = cfg.model
    return PiT(
        space_dim=m.space_dim,
        in_dim=m.in_dim,
        out_dim=m.out_dim,
        hid_dim=m.hid_dim,
        n_head=m.n_head,
        n_blocks=m.n_blocks,
        en_loc=m.en_loc,
        de_loc=m.de_loc,
        concat_mesh=m.concat_mesh,
        use_instance_norm=m.use_instance_norm,
        residual_output=m.residual_output,
        fused_kernel=m.fused_kernel,
        compute_dtype=m.compute_dtype,
    )


def _task_kwargs(cfg: BenchmarkConfig) -> dict:
    kw = dict(
        loss_p=cfg.loss_p,
        out_dim=cfg.model.out_dim,
        swap_loss_args=cfg.swap_loss_args,
        rollout_steps=cfg.rollout_steps,
        trajectory_loss=cfg.trajectory_loss,
    )
    if (cfg.model_variant or "pit") == "selfpit":
        # the hybrid attention's band_width carries the keras NonNeg
        # constraint (reference: tensorflow/1_InviscidBurgers/utils.py:437)
        # — project-after-update semantics, like naca_tf's tan bandwidth
        kw["param_constraint"] = nonneg_bandwidths
    return kw


def nonneg_bandwidths(params):
    """Project every ``band_width`` parameter onto [0, inf) — keras NonNeg
    constraint semantics, applied after each optimizer update (reference:
    tensorflow/6_NACA/utils.py:99-104,115)."""
    import jax

    def clamp(path, leaf):
        if any(getattr(k, "key", None) == "band_width" for k in path):
            return jnp.maximum(leaf, 0.0)
        return leaf

    return jax.tree_util.tree_map_with_path(clamp, params)


def setup_burgers(cfg, data_path=None, ntrain=None, ntest=None) -> Problem:
    ntrain, ntest = ntrain or cfg.ntrain, ntest or cfg.ntest
    x_tr, y_tr, x_te, y_te = loaders.burgers(
        data_path, ntrain, ntest, L=(cfg.grid or (1024,))[0]
    )
    L = x_tr.shape[1]
    mesh = jnp.asarray(meshes.grid_1d(L))
    mesh_ltt = jnp.asarray(meshes.grid_1d(cfg.latent_grid[0]))
    geom = build_geometry_host(
        mesh, mesh_ltt, mesh, metric=cfg.metric,
        en_loc=cfg.model.en_loc, de_loc=cfg.model.de_loc,
    )
    model = _make_model(cfg)
    task = Task(model=model, **_task_kwargs(cfg))
    return Problem(
        cfg, model, task, geom,
        {"x": jnp.asarray(x_tr), "y": jnp.asarray(y_tr)},
        {"x": jnp.asarray(x_te), "y": jnp.asarray(y_te)},
        ntrain, ntest,
    )


def setup_sod(cfg, data_path=None, ntrain=None, ntest=None) -> Problem:
    ntrain, ntest = ntrain or cfg.ntrain, ntest or cfg.ntest
    x_tr, y_tr, x_te, y_te = loaders.sod(
        data_path, ntrain, ntest, L=(cfg.grid or (1024,))[0]
    )
    L = x_tr.shape[1]
    lo, hi = cfg.domain
    mesh = jnp.asarray(meshes.grid_1d(L, lo, hi))
    mesh_ltt = jnp.asarray(meshes.grid_1d(cfg.latent_grid[0], lo, hi))
    geom = build_geometry_host(
        mesh, mesh_ltt, mesh, metric=cfg.metric,
        en_loc=cfg.model.en_loc, de_loc=cfg.model.de_loc,
    )
    model = _make_model(cfg)
    task = Task(model=model, **_task_kwargs(cfg))
    return Problem(
        cfg, model, task, geom,
        {"x": jnp.asarray(x_tr), "y": jnp.asarray(y_tr)},
        {"x": jnp.asarray(x_te), "y": jnp.asarray(y_te)},
        ntrain, ntest,
    )


def darcy_geometry(cfg, s: int) -> Geometry:
    """Geometry at resolution s (re-built at 421 for ZSSR eval,
    reference: train_darcy.py:151-180)."""
    mesh = jnp.asarray(meshes.grid_2d(s).reshape(-1, 2))
    mesh_ltt = jnp.asarray(meshes.grid_2d(cfg.latent_grid[0]).reshape(-1, 2))
    return build_geometry_host(
        mesh, mesh_ltt, mesh, metric=cfg.metric,
        en_loc=cfg.model.en_loc, de_loc=cfg.model.de_loc,
    )


def setup_darcy(
    cfg, data_path=None, ntrain=None, ntest=None, downsampling=10,
    normalizers=None,
) -> Problem:
    """``normalizers``: optional (x_norm, y_norm) fitted at the *training*
    resolution — passed during ZSSR evaluation so the 421^2 run uses
    bilinearly-resized 43^2 statistics exactly like the reference
    (train_darcy.py:151-157 reuses x_normalizer/y_normalizer)."""
    ntrain, ntest = ntrain or cfg.ntrain, ntest or cfg.ntest
    train_path = test_path = None
    if data_path:
        train_path = f"{data_path}/piececonst_r421_N1024_smooth1.mat"
        test_path = f"{data_path}/piececonst_r421_N1024_smooth2.mat"
    x_tr, y_tr, x_te, y_te = loaders.darcy(
        train_path, test_path, downsampling, ntrain, ntest
    )
    s = x_tr.shape[1]
    if normalizers is not None:
        x_norm, y_norm = normalizers
    else:
        x_norm = PixelWiseNormalizer.fit(jnp.asarray(x_tr))
        y_norm = PixelWiseNormalizer.fit(jnp.asarray(y_tr))
    x_tr_n = np.asarray(x_norm.normalize(jnp.asarray(x_tr)))
    x_te_n = np.asarray(x_norm.normalize(jnp.asarray(x_te)))

    geom = darcy_geometry(cfg, s)
    model = _make_model(cfg)

    def denorm(out):  # (B, L, 1) -> denormalized grid
        # slice to the grid size first: sequence-parallel ZSSR decode pads
        # the query rows to a multiple of the mesh axis (parallel/sharding
        # sequence_shard_geometry pad=True); harmless when unpadded
        out = out[:, : s * s].reshape(out.shape[0], s, s, -1)
        return y_norm.denormalize(out)

    task = Task(model=model, postprocess=denorm, **_task_kwargs(cfg))
    flat = lambda a: jnp.asarray(a).reshape(a.shape[0], -1, a.shape[-1])
    return Problem(
        cfg, model, task, geom,
        {"x": flat(x_tr_n), "y": jnp.asarray(y_tr)},
        {"x": flat(x_te_n), "y": jnp.asarray(y_te)},
        ntrain, ntest, x_normalizer=x_norm, y_normalizer=y_norm,
        extras={"s": s, "downsampling": downsampling},
    )


def setup_vorticity(cfg, data_path=None, ntrain=None, ntest=None) -> Problem:
    ntrain, ntest = ntrain or cfg.ntrain, ntest or cfg.ntest
    x_tr, y_tr, x_te, y_te = loaders.vorticity(
        data_path, ntrain, ntest, cfg.memory, cfg.rollout_steps
    )
    s = x_tr.shape[1]
    mesh = jnp.asarray(meshes.grid_2d(s, endpoint=False).reshape(-1, 2))
    mesh_ltt = jnp.asarray(
        meshes.grid_2d(cfg.latent_grid[0], endpoint=False).reshape(-1, 2)
    )
    geom = build_geometry_host(
        mesh, mesh_ltt, mesh, metric=cfg.metric,
        en_loc=cfg.model.en_loc, de_loc=cfg.model.de_loc,
    )
    model = _make_model(cfg)
    task = Task(model=model, **_task_kwargs(cfg))
    flat = lambda a: jnp.asarray(a).reshape(a.shape[0], s * s, a.shape[-1])
    return Problem(
        cfg, model, task, geom,
        {"x": flat(x_tr), "y": flat(y_tr)},
        {"x": flat(x_te), "y": flat(y_te)},
        ntrain, ntest, extras={"s": s},
    )


def setup_elasticity(
    cfg, data_path=None, ntrain=None, ntest=None, n_points=972
) -> Problem:
    ntrain, ntest = ntrain or cfg.ntrain, ntest or cfg.ntest
    X_tr, ext_tr, Y_tr, X_te, ext_te, Y_te = loaders.elasticity(
        data_path, ntrain, ntest, n_points=n_points
    )
    model = _make_model(cfg)

    # masked-tile band skip (PIT_ELASTICITY_BAND=0 disables): the clouds
    # sample a CLOSED boundary curve, so sorting each sample by angle
    # around its centroid makes index order follow spatial order and the
    # locality mask becomes a narrow CIRCULAR column band per row tile
    # (kernels/posatt_batched.py BandSpec.wrap). Sorting inputs, coords
    # and targets with one permutation is exact (posatt is
    # permutation-equivariant in keys; the loss per-point). latent ==
    # output == input cloud here, and en_loc == de_loc for the reference
    # config, so ONE threshold/band pair serves encoder and decoder.
    band_width = band_wrap = None
    if os.environ.get("PIT_ELASTICITY_BAND", "1") != "0":
        import numpy as _np

        from position_induced_transformer_tpu.data.meshes import (
            angular_sort_perm,
        )
        from position_induced_transformer_tpu.kernels import (
            BandSpec,
            band_tile_rows,
        )
        from position_induced_transformer_tpu.ops.locality import (
            batched_band_starts,
            batched_topk_thresholds,
        )

        def sort_split(X, ext, Y):
            perm = angular_sort_perm(ext)
            take = lambda a: _np.take_along_axis(
                _np.asarray(a), perm[..., None], axis=1
            )
            return take(X), take(ext), take(Y)

        X_tr, ext_tr, Y_tr = sort_split(X_tr, ext_tr, Y_tr)
        X_te, ext_te, Y_te = sort_split(X_te, ext_te, Y_te)
        if cfg.model.en_loc == cfg.model.de_loc and cfg.model.en_loc < 1.0:
            tlo = band_tile_rows(ext_tr.shape[1])
            m_tr, m_te = jnp.asarray(ext_tr), jnp.asarray(ext_te)
            thr_tr = batched_topk_thresholds(
                m_tr, m_tr, cfg.model.en_loc, cfg.metric
            )
            thr_te = batched_topk_thresholds(
                m_te, m_te, cfg.model.en_loc, cfg.metric
            )
            b_tr = batched_band_starts(
                m_tr, m_tr, thr_tr, tlo, cfg.metric, circular=True
            )
            if b_tr is not None:
                b_te = batched_band_starts(
                    m_te, m_te, thr_te, tlo, cfg.metric,
                    width=b_tr[1], circular=True,
                )
                if b_te is not None:
                    band_width = max(b_tr[1], b_te[1])
                    band_wrap = max(b_tr[2], b_te[2])
                    if b_tr[1] < band_width:
                        b_tr = batched_band_starts(
                            m_tr, m_tr, thr_tr, tlo, cfg.metric,
                            width=band_width, circular=True,
                        )

    extras_tr = {}
    extras_te = {}
    if band_width is not None:
        extras_tr = {"thr": thr_tr, "band": b_tr[0]}
        extras_te = {"thr": thr_te, "band": b_te[0]}

    def geom_fn(batch):
        # latent mesh == output mesh == input cloud, per sample
        # (reference: train_elasticity.py:46-53 mesh_ltt = mesh_out.clone()).
        # Lazy: raw coordinates only — the attention op fuses distances,
        # locality mask, softmax and contraction on TPU
        # (kernels/posatt_batched.py); XLA fallback elsewhere.
        m = batch["mesh"]
        g = build_geometry(
            m, m, m, metric=cfg.metric,
            en_loc=cfg.model.en_loc, de_loc=cfg.model.de_loc,
            lazy=True,
        )
        thr = batch.get("thr")
        starts = batch.get("band")
        if thr is None or starts is None or band_width is None:
            # deployment batches carry raw coords only: in-kernel mask
            return g
        spec = BandSpec(starts, band_width, band_wrap)
        return dataclasses.replace(
            g, thr_down=thr, thr_up=thr, band_down=spec, band_up=spec
        )

    # NOTE (r3): precomputed thresholds ALONE measured no faster here
    # (0.96x — at L=972 the (B, L, 1) gathers cost as much as the ~19
    # in-kernel min passes they remove); they ride along now because the
    # band skip requires them (r4 A/B in BASELINE.md).
    task = Task(
        model=model, geom_fn=geom_fn, geometry_required_keys=("mesh",),
        **_task_kwargs(cfg),
    )
    return Problem(
        cfg, model, task, None,
        {"x": jnp.asarray(X_tr), "mesh": jnp.asarray(ext_tr),
         "y": jnp.asarray(Y_tr), **extras_tr},
        {"x": jnp.asarray(X_te), "mesh": jnp.asarray(ext_te),
         "y": jnp.asarray(Y_te), **extras_te},
        ntrain, ntest,
    )


def setup_naca(cfg, data_path=None, ntrain=None, ntest=None) -> Problem:
    ntrain, ntest = ntrain or cfg.ntrain, ntest or cfg.ntest
    c_tr, X_tr, Y_tr, c_te, X_te, Y_te = loaders.naca(
        data_path, ntrain, ntest, nx=cfg.grid[0], ny=cfg.grid[1]
    )
    xd = yd = 4  # latent downsampling strides (reference: train_naca.py:86-87)
    x_res, y_res = cfg.latent_grid

    from position_induced_transformer_tpu.ops.locality import (
        batched_topk_thresholds,
    )

    def prep(coords, X, Y):
        # latent mesh: strided slice of the output C-grid per sample
        # (reference: train_naca.py:62-65)
        ltt = X[:, ::xd, ::yd, :][:, :x_res, :y_res, :].reshape(X.shape[0], -1, 2)
        out = X.reshape(X.shape[0], -1, 2)
        mesh_in = jnp.asarray(coords)
        mesh_ltt = jnp.asarray(ltt)
        mesh_out = jnp.asarray(out)
        d = {
            "x": mesh_in,  # same array as mesh_in: one device buffer
            "mesh_in": mesh_in,
            "mesh_ltt": mesh_ltt,
            "mesh_out": mesh_out,
            "y": jnp.asarray(Y),
        }
        # per-sample locality thresholds are constants: once at setup
        # (ops/locality.batched_topk_thresholds), gathered with the batch.
        # Measured +13% NACA training throughput (TPU v5e A/B, /tmp-level
        # experiment 2026-08-16): removes the c-1 masked-min passes from
        # the fused kernel's fwd AND bwd at the 11271-row decoder
        thr_down = batched_topk_thresholds(
            mesh_ltt, mesh_in, cfg.model.en_loc, cfg.metric
        )
        if thr_down is not None:
            d["thr_down"] = thr_down
        thr_up = batched_topk_thresholds(
            mesh_out, mesh_ltt, cfg.model.de_loc, cfg.metric, chunk=16
        )
        if thr_up is not None:
            d["thr_up"] = thr_up
        return d

    model = _make_model(cfg)
    d_tr = prep(c_tr, X_tr, Y_tr)
    d_te = prep(c_te, X_te, Y_te)

    # decoder masked-tile skip: the C-grid ordering is spatially coherent,
    # so at locality 0.02 each 256-row tile's kept columns span ~156 of
    # 768 padded latent columns — the fused kernel then computes only a
    # (256, band) slice per tile (kernels/posatt_batched.py BandSpec).
    # One static width shared by both splits (the kernel specializes on
    # it); per-sample starts gathered with the batch like thr_up.
    band_width = None
    if "thr_up" in d_tr and os.environ.get("PIT_BATCHED_BAND", "1") != "0":
        from position_induced_transformer_tpu.kernels import (
            BandSpec,
            band_tile_rows,
        )
        from position_induced_transformer_tpu.ops.locality import (
            batched_band_starts,
        )

        tlo = band_tile_rows(d_tr["mesh_out"].shape[1])
        b_tr = batched_band_starts(
            d_tr["mesh_out"], d_tr["mesh_ltt"], d_tr["thr_up"], tlo,
            cfg.metric, chunk=16,
        )
        if b_tr is not None:
            b_te = batched_band_starts(
                d_te["mesh_out"], d_te["mesh_ltt"], d_te["thr_up"], tlo,
                cfg.metric, chunk=16, width=b_tr[1],
            )
            if b_te is not None:
                band_width = max(b_tr[1], b_te[1])
                if b_tr[1] < band_width:  # re-clamp to the common width
                    b_tr = batched_band_starts(
                        d_tr["mesh_out"], d_tr["mesh_ltt"], d_tr["thr_up"],
                        tlo, cfg.metric, chunk=16, width=band_width,
                    )
                d_tr["band_up"] = b_tr[0]
                d_te["band_up"] = b_te[0]

    def geom_fn(batch):
        # lazy in-step per-sample geometry: top-k locality semantics (same
        # mask as the reference's torch.quantile absent ties), fused
        # batched kernel on TPU (kernels/posatt_batched.py)
        g = build_geometry(
            batch["mesh_in"], batch["mesh_ltt"], batch["mesh_out"],
            metric=cfg.metric, en_loc=cfg.model.en_loc, de_loc=cfg.model.de_loc,
            lazy=True,
        )
        starts = batch.get("band_up")
        return dataclasses.replace(
            g, thr_down=batch.get("thr_down"), thr_up=batch.get("thr_up"),
            band_up=(
                None if starts is None or band_width is None
                else BandSpec(starts, band_width)
            ),
        )

    task = Task(
        model=model, geom_fn=geom_fn,
        geometry_required_keys=("mesh_in", "mesh_ltt", "mesh_out"),
        **_task_kwargs(cfg),
    )
    return Problem(cfg, model, task, None, d_tr, d_te, ntrain, ntest)


def setup_cylinder(
    cfg, data_path=None, ntrain=None, ntest=None, n_points=4390, n_latent=896
) -> Problem:
    ntrain_req = ntrain or cfg.ntrain
    ntest_req = ntest or cfg.ntest
    # the reference trajectories carry 11 frames -> 10 one-step pairs each
    # (train_cylinder.py:8-16); over-request by that heuristic, then trim
    # to the EXACT requested sample counts below (a file with a different
    # frame count yields a different pairs-per-trajectory)
    n_traj_train = max(1, -(-ntrain_req // 10))
    n_traj_test = max(1, -(-ntest_req // 10))
    paths = (None,) * 4
    elements_path = None
    if data_path:
        paths = (
            f"{data_path}/WakeCylinder_train.mat",
            f"{data_path}/WakeCylinder_test.mat",
            f"{data_path}/vertices.csv",
            f"{data_path}/vertices_small.csv",
        )
        elements_path = f"{data_path}/elements.csv"
    x_tr, y_tr, x_te, y_te, mesh, mesh_ltt, test_traj, elements = loaders.cylinder(
        *paths, ntrain=n_traj_train, ntest=n_traj_test,
        n_points=n_points, n_latent=n_latent, elements_path=elements_path,
    )
    x_tr, y_tr = x_tr[:ntrain_req], y_tr[:ntrain_req]
    x_te, y_te = x_te[:ntest_req], y_te[:ntest_req]
    geom = build_geometry_host(
        mesh, mesh_ltt, mesh,
        metric=cfg.metric, en_loc=cfg.model.en_loc, de_loc=cfg.model.de_loc,
    )
    model = _make_model(cfg)
    task = Task(model=model, **_task_kwargs(cfg))
    return Problem(
        cfg, model, task, geom,
        {"x": jnp.asarray(x_tr), "y": jnp.asarray(y_tr)},
        {"x": jnp.asarray(x_te), "y": jnp.asarray(y_te)},
        x_tr.shape[0], x_te.shape[0],
        extras={"test_trajectories": test_traj, "elements": elements},
    )


def setup_burgers_tf(cfg, data_path=None, ntrain=None, ntest=None) -> Problem:
    """TF-family Burgers: PiTTF over precomputed normalized periodic
    distance matrices (reference: tensorflow/1_InviscidBurgers/train.py:34-44,
    utils.py:34-48)."""
    from position_induced_transformer_tpu.models import (
        PiTTF,
        TFGeometry,
        pairwise_dist_periodic_1d,
        tf_precompute_thresholds,
    )

    ntrain, ntest = ntrain or cfg.ntrain, ntest or cfg.ntest
    Lt = (cfg.latent_grid or (1024,))[0]
    x_tr, y_tr, x_te, y_te = loaders.burgers(
        data_path, ntrain, ntest, L=(cfg.grid or (1024,))[0]
    )
    # mesh resolution follows the DATA (a real file at another length
    # would otherwise crash deep inside the attention einsum); cfg.grid
    # only sizes the synthetic fallback — same convention as setup_sod
    L = x_tr.shape[1]
    geom = tf_precompute_thresholds(
        TFGeometry(
            m_qry=pairwise_dist_periodic_1d(L, L),
            m_cross=pairwise_dist_periodic_1d(L, Lt),
            m_ltt=pairwise_dist_periodic_1d(Lt, Lt),
        ),
        cfg.model.en_loc, cfg.model.de_loc,
    )
    mesh = jnp.asarray(meshes.grid_1d(L))
    m = cfg.model
    model = PiTTF(
        out_dim=m.out_dim, hid_dim=m.hid_dim, n_head=m.n_head,
        locality_encoder=m.en_loc, locality_decoder=m.de_loc,
        n_blocks=m.n_blocks, use_decoder_selfatt=True,
        **_variant_attention(cfg),
    )

    def apply_fn(params, geom, batch):
        return model.apply({"params": params}, geom, mesh, batch["x"])

    task = Task(
        model=model, apply_fn=apply_fn, batch_mean_loss=True, keras_adam=True,
        **_task_kwargs(cfg),
    )
    init_fn = lambda rng, data: model.init(rng, geom, mesh, data["x"])
    return Problem(
        cfg, model, task, geom,
        {"x": jnp.asarray(x_tr), "y": jnp.asarray(y_tr)},
        {"x": jnp.asarray(x_te), "y": jnp.asarray(y_te)},
        ntrain, ntest, init_fn=init_fn,
    )


def setup_sod_tf(cfg, data_path=None, ntrain=None, ntest=None) -> Problem:
    """TF-family ShockTube: PiTTF with the r^2 bandwidth over plain 1-D grid
    distance^2 matrices, single output variable
    (reference: tensorflow/2_ShockTube/train.py:14-36, utils.py:33-44,118)."""
    from position_induced_transformer_tpu.models import (
        PiTTF,
        TFGeometry,
        tf_precompute_thresholds,
    )
    from position_induced_transformer_tpu.ops import euclidean_sq

    ntrain, ntest = ntrain or cfg.ntrain, ntest or cfg.ntest
    Lt = (cfg.latent_grid or (1024,))[0]
    x_tr, y_tr, x_te, y_te = loaders.sod(
        data_path, ntrain, ntest, L=(cfg.grid or (2048,))[0]
    )
    # mesh resolution follows the DATA (cfg.grid sizes the synthetic
    # fallback only — same convention as setup_sod/setup_burgers_tf)
    L = x_tr.shape[1]
    # TF variant predicts a single variable (Y[..., newaxis] of one field)
    y_tr, y_te = y_tr[..., :1], y_te[..., :1]
    g = lambda n: jnp.asarray(meshes.grid_1d(n))
    geom = tf_precompute_thresholds(
        TFGeometry(
            m_qry=euclidean_sq(g(L), g(L)),
            m_cross=euclidean_sq(g(L), g(Lt)),
            m_ltt=euclidean_sq(g(Lt), g(Lt)),
        ),
        cfg.model.en_loc, cfg.model.de_loc,
    )
    mesh = g(L)
    m = cfg.model
    model = PiTTF(
        out_dim=m.out_dim, hid_dim=m.hid_dim, n_head=m.n_head,
        locality_encoder=m.en_loc, locality_decoder=m.de_loc,
        n_blocks=m.n_blocks, bandwidth="square", use_decoder_selfatt=True,
        **_variant_attention(cfg),
    )

    def apply_fn(params, geom, batch):
        return model.apply({"params": params}, geom, mesh, batch["x"])

    task = Task(
        model=model, apply_fn=apply_fn, batch_mean_loss=True, keras_adam=True,
        **_task_kwargs(cfg),
    )
    init_fn = lambda rng, data: model.init(rng, geom, mesh, data["x"])
    return Problem(
        cfg, model, task, geom,
        {"x": jnp.asarray(x_tr), "y": jnp.asarray(y_tr)},
        {"x": jnp.asarray(x_te), "y": jnp.asarray(y_te)},
        ntrain, ntest, init_fn=init_fn,
    )


def setup_darcy_tf(
    cfg, data_path=None, ntrain=None, ntest=None, downsampling=10,
    normalizers=None,
) -> Problem:
    """TF-family Darcy: PiTTF (no decoder self-attention) over dist^2/2
    matrices on endpoint-dropped grids, X normalized with pixel-wise train
    statistics, Y-denormalization inside the model call (reference:
    tensorflow/3_Darcy2D/train.py:33-36, utils.py:53-76,180-246).

    ``normalizers``: optional (x_norm, y_norm) fitted at the *training*
    resolution — passed during ZSSR evaluation so the 421^2 run reuses
    bilinearly-resized training statistics exactly like the reference
    (tensorflow/3_Darcy2D/evaluate.py:24-25,58)."""
    from position_induced_transformer_tpu.models import (
        PiTTF,
        TFGeometry,
        pairwise_dist_half,
        tf_precompute_thresholds,
    )

    ntrain, ntest = ntrain or cfg.ntrain, ntest or cfg.ntest
    train_path = test_path = None
    if data_path:
        train_path = f"{data_path}/piececonst_r421_N1024_smooth1.mat"
        test_path = f"{data_path}/piececonst_r421_N1024_smooth2.mat"
    x_tr, y_tr, x_te, y_te = loaders.darcy(
        train_path, test_path, downsampling, ntrain, ntest
    )
    s = x_tr.shape[1]
    st = cfg.latent_grid[0]
    grid_q = jnp.asarray(meshes.grid_2d(s, endpoint=False).reshape(-1, 2))
    grid_l = jnp.asarray(meshes.grid_2d(st, endpoint=False).reshape(-1, 2))
    # m_qry is only consumed by the decoder self-attention (absent in the
    # Darcy variant) — building it at the 421^2 ZSSR resolution would cost
    # 177,241^2 floats, so it is skipped
    geom = tf_precompute_thresholds(
        TFGeometry(
            m_qry=None,
            m_cross=pairwise_dist_half(grid_q, grid_l),
            m_ltt=pairwise_dist_half(grid_l, grid_l),
        ),
        cfg.model.en_loc, cfg.model.de_loc,
    )
    if normalizers is not None:
        x_norm, y_norm = normalizers
    else:
        x_norm = PixelWiseNormalizer.fit(jnp.asarray(x_tr))
        y_norm = PixelWiseNormalizer.fit(jnp.asarray(y_tr))
    x_tr = np.asarray(x_norm.normalize(jnp.asarray(x_tr)))
    x_te = np.asarray(x_norm.normalize(jnp.asarray(x_te)))
    m = cfg.model
    model = PiTTF(
        out_dim=m.out_dim, hid_dim=m.hid_dim, n_head=m.n_head,
        locality_encoder=m.en_loc, locality_decoder=m.de_loc,
        n_blocks=m.n_blocks, use_decoder_selfatt=False,
        **_variant_attention(cfg),
    )

    def apply_fn(params, geom, batch):
        out = model.apply({"params": params}, geom, grid_q, batch["x"])
        # slice before the grid reshape: SP ZSSR decode pads the query rows
        out = out[:, : s * s]
        return y_norm.denormalize(out.reshape(out.shape[0], s, s, m.out_dim))

    task = Task(
        model=model, apply_fn=apply_fn, batch_mean_loss=True, keras_adam=True,
        **_task_kwargs(cfg),
    )
    flat = lambda a: jnp.asarray(a).reshape(a.shape[0], -1, a.shape[-1])
    init_fn = lambda rng, data: model.init(rng, geom, grid_q, data["x"])
    return Problem(
        cfg, model, task, geom,
        {"x": flat(x_tr), "y": jnp.asarray(y_tr)},
        {"x": flat(x_te), "y": jnp.asarray(y_te)},
        ntrain, ntest, x_normalizer=x_norm, y_normalizer=y_norm,
        extras={"s": s, "downsampling": downsampling}, init_fn=init_fn,
    )


def setup_vorticity_tf(cfg, data_path=None, ntrain=None, ntest=None) -> Problem:
    """TF-family vorticity: PiTTF (no decoder self-attention) over 4-shift
    periodic distance matrices, 20-step rollout
    (reference: tensorflow/4_Vorticity/train.py:30-34, utils.py:36-61,108-135)."""
    from position_induced_transformer_tpu.models import (
        PiTTF,
        TFGeometry,
        tf_precompute_thresholds,
    )
    from position_induced_transformer_tpu.models.pit_tf import (
        pairwise_dist_periodic_2d,
    )

    ntrain, ntest = ntrain or cfg.ntrain, ntest or cfg.ntest
    x_tr, y_tr, x_te, y_te = loaders.vorticity(
        data_path, ntrain, ntest, cfg.memory, cfg.rollout_steps
    )
    s = x_tr.shape[1]
    st = cfg.latent_grid[0]
    grid_q = jnp.asarray(meshes.grid_2d(s, endpoint=False).reshape(-1, 2))
    grid_l = jnp.asarray(meshes.grid_2d(st, endpoint=False).reshape(-1, 2))
    geom = tf_precompute_thresholds(
        TFGeometry(
            m_qry=None,  # no decoder self-attention in this variant
            m_cross=pairwise_dist_periodic_2d(grid_q, grid_l),
            m_ltt=pairwise_dist_periodic_2d(grid_l, grid_l),
        ),
        cfg.model.en_loc, cfg.model.de_loc,
    )
    m = cfg.model
    model = PiTTF(
        out_dim=m.out_dim, hid_dim=m.hid_dim, n_head=m.n_head,
        locality_encoder=m.en_loc, locality_decoder=m.de_loc,
        n_blocks=m.n_blocks, use_decoder_selfatt=False,
        **_variant_attention(cfg),
    )

    def apply_fn(params, geom, batch):
        return model.apply({"params": params}, geom, grid_q, batch["x"])

    task = Task(
        model=model, apply_fn=apply_fn, batch_mean_loss=True, keras_adam=True,
        **_task_kwargs(cfg),
    )
    init_fn = lambda rng, data: model.init(rng, geom, grid_q, data["x"])
    flat = lambda a: jnp.asarray(a).reshape(a.shape[0], s * s, a.shape[-1])
    return Problem(
        cfg, model, task, geom,
        {"x": flat(x_tr), "y": flat(y_tr)},
        {"x": flat(x_te), "y": flat(y_te)},
        ntrain, ntest, extras={"s": s}, init_fn=init_fn,
    )


def setup_elasticity_tf(
    cfg, data_path=None, ntrain=None, ntest=None, n_points=972
) -> Problem:
    """TF-family elasticity: point-cloud PiTTF with in-call per-sample
    distances (reference: tensorflow/5_Elasticity/train.py:25,
    utils.py:113-178)."""
    from position_induced_transformer_tpu.models import PiTTFPointCloud

    ntrain, ntest = ntrain or cfg.ntrain, ntest or cfg.ntest
    X_tr, ext_tr, Y_tr, X_te, ext_te, Y_te = loaders.elasticity(
        data_path, ntrain, ntest, n_points=n_points
    )
    m = cfg.model
    model = PiTTFPointCloud(
        out_dim=m.out_dim, hid_dim=m.hid_dim, n_head=m.n_head,
        locality_encoder=m.en_loc, locality_decoder=m.de_loc,
        n_blocks=m.n_blocks,
        **_variant_attention(cfg, point_cloud=True),
    )

    # the point clouds are constant across training, so the (B, L, L)
    # percentile sort the reference pays per forward
    # (tensorflow/5_Elasticity/utils.py:92-95) is data: per-sample
    # thresholds once at setup, gathered with the batch and handed to the
    # model through the geometry slot. Angular sorting (see
    # setup_elasticity) additionally gives the fused coordinate kernel a
    # circular kept-column band per locality (PIT_ELASTICITY_BAND=0
    # disables the sort+band).
    from position_induced_transformer_tpu.ops.locality import (
        batched_band_starts,
        batched_halfdist_percentile_thresholds as _pct_thr,
    )

    use_band = os.environ.get("PIT_ELASTICITY_BAND", "1") != "0"
    if use_band:
        from position_induced_transformer_tpu.data.meshes import (
            angular_sort_perm,
        )

        def _sort(X, ext, Y):
            perm = angular_sort_perm(ext)
            take = lambda a: np.take_along_axis(
                np.asarray(a), perm[..., None], axis=1
            )
            return take(X), take(ext), take(Y)

        X_tr, ext_tr, Y_tr = _sort(X_tr, ext_tr, Y_tr)
        X_te, ext_te, Y_te = _sort(X_te, ext_te, Y_te)

    from position_induced_transformer_tpu.kernels import (
        BandSpec,
        band_tile_rows,
    )

    def data_dict(X, ext, Y):
        X = jnp.asarray(X)
        d = {"x": X, "mesh": jnp.asarray(ext), "y": jnp.asarray(Y)}
        thr_en = _pct_thr(X[..., :2], m.en_loc)
        if thr_en is not None:
            d["thr_en"] = thr_en
        thr_de = (
            thr_en if m.de_loc == m.en_loc else _pct_thr(X[..., :2], m.de_loc)
        )
        if thr_de is not None:
            d["thr_de"] = thr_de
        return d

    d_tr = data_dict(X_tr, ext_tr, Y_tr)
    d_te = data_dict(X_te, ext_te, Y_te)
    # circular kept-column bands per locality (the thresholds are on the
    # HALVED distances — batched_band_starts masks with full euclidean_sq,
    # so hand it 2*thr). One static (width, wrap) per threshold key.
    band_meta = {}
    if use_band:
        tlo = band_tile_rows(d_tr["x"].shape[1])
        for key in ("thr_en", "thr_de"):
            if key not in d_tr:
                continue
            if key == "thr_de" and m.de_loc == m.en_loc and "thr_en" in band_meta:
                band_meta["thr_de"] = band_meta["thr_en"]
                d_tr["band_de"] = d_tr["band_en"]
                d_te["band_de"] = d_te["band_en"]
                continue
            ctr, cte = d_tr["x"][..., :2], d_te["x"][..., :2]
            b_tr = batched_band_starts(
                ctr, ctr, 2.0 * d_tr[key], tlo, circular=True
            )
            if b_tr is None:
                continue
            b_te = batched_band_starts(
                cte, cte, 2.0 * d_te[key], tlo, width=b_tr[1], circular=True
            )
            if b_te is None:
                continue
            w = max(b_tr[1], b_te[1])
            if b_tr[1] < w:
                b_tr = batched_band_starts(
                    ctr, ctr, 2.0 * d_tr[key], tlo, width=w, circular=True
                )
            bkey = key.replace("thr", "band")
            d_tr[bkey] = b_tr[0]
            d_te[bkey] = b_te[0]
            band_meta[key] = (w, max(b_tr[2], b_te[2]))

    def _spec(batch, bkey, tkey):
        starts = batch.get(bkey)
        meta = band_meta.get(tkey)
        if starts is None or meta is None:
            return None
        return BandSpec(starts, meta[0], meta[1])

    geom_fn = lambda batch: {
        "thr_en": batch.get("thr_en"), "thr_de": batch.get("thr_de"),
        "band_en": _spec(batch, "band_en", "thr_en"),
        "band_de": _spec(batch, "band_de", "thr_de"),
    }
    apply_fn = lambda params, geom, batch: model.apply(
        {"params": params}, batch["x"],
        (geom or {}).get("thr_en"), (geom or {}).get("thr_de"),
        (geom or {}).get("band_en"), (geom or {}).get("band_de"),
    )
    task = Task(
        model=model, apply_fn=apply_fn, geom_fn=geom_fn,
        geometry_required_keys=(),  # thresholds optional, 'mesh' plot-only
        batch_mean_loss=True, keras_adam=True, **_task_kwargs(cfg),
    )
    init_fn = lambda rng, data: model.init(rng, data["x"])
    return Problem(
        cfg, model, task, None, d_tr, d_te, ntrain, ntest, init_fn=init_fn,
    )


def setup_naca_tf(cfg, data_path=None, ntrain=None, ntest=None) -> Problem:
    """TF-family NACA: PiTTF (tan bandwidth, no decoder self-attention)
    over index-space dist^2/2 matrices; input = C-grid vertex coordinates,
    output = Mach field (reference: tensorflow/6_NACA/train.py:25-34,
    utils.py:25-52,115)."""
    from position_induced_transformer_tpu.models import (
        PiTTF,
        TFGeometry,
        pairwise_dist_half,
        tf_precompute_thresholds,
    )

    ntrain, ntest = ntrain or cfg.ntrain, ntest or cfg.ntest
    # mach=True: the single Mach field Q[:, 4] — the TF reference's
    # target (tensorflow/6_NACA/utils.py:48), NOT channel 0 of the
    # torch-family 4-channel slice
    c_tr, X_tr, Y_tr, c_te, X_te, Y_te = loaders.naca(
        data_path, ntrain, ntest, nx=cfg.grid[0], ny=cfg.grid[1], mach=True
    )
    nx, ny = X_tr.shape[1], X_tr.shape[2]
    lx, ly = cfg.latent_grid
    grid_q = jnp.asarray(meshes.grid_2d_rect(nx, ny))
    grid_l = jnp.asarray(meshes.grid_2d_rect(lx, ly))
    # Thresholds are precomputed at BOTH p and 1-p, so the sign-indefinite
    # 'tan' bandwidth (negative before the first NonNeg projection) is
    # served exactly by a per-head sign-aware rescale — no in-step sort
    # (tf_precompute_thresholds / MultiHeadPosAtt).
    geom = tf_precompute_thresholds(
        TFGeometry(
            m_qry=None,  # no decoder self-attention in this variant
            m_cross=pairwise_dist_half(grid_q, grid_l),
            m_ltt=pairwise_dist_half(grid_l, grid_l),
        ),
        cfg.model.en_loc, cfg.model.de_loc,
    )
    m = cfg.model
    model = PiTTF(
        out_dim=m.out_dim, hid_dim=m.hid_dim, n_head=m.n_head,
        locality_encoder=m.en_loc, locality_decoder=m.de_loc,
        n_blocks=m.n_blocks, bandwidth="tan", use_decoder_selfatt=False,
        **_variant_attention(cfg),
    )

    def apply_fn(params, geom, batch):
        return model.apply({"params": params}, geom, grid_q, batch["x"])

    # dict-merge: _task_kwargs already sets param_constraint for the
    # selfpit variant; naca_tf needs it unconditionally (tan bandwidth)
    task = Task(
        model=model, apply_fn=apply_fn, batch_mean_loss=True, keras_adam=True,
        **{**_task_kwargs(cfg), "param_constraint": nonneg_bandwidths},
    )
    init_fn = lambda rng, data: model.init(rng, geom, grid_q, data["x"])
    flat = lambda a: jnp.asarray(a).reshape(a.shape[0], -1, a.shape[-1])
    return Problem(
        cfg, model, task, geom,
        {"x": flat(X_tr), "y": flat(Y_tr)},
        {"x": flat(X_te), "y": flat(Y_te)},
        ntrain, ntest, init_fn=init_fn,
    )


SETUPS: Dict[str, Callable[..., Problem]] = {
    "burgers": setup_burgers,
    "sod": setup_sod,
    "darcy": setup_darcy,
    "vorticity": setup_vorticity,
    "elasticity": setup_elasticity,
    "naca": setup_naca,
    "cylinder": setup_cylinder,
    "burgers_tf": setup_burgers_tf,
    "sod_tf": setup_sod_tf,
    "darcy_tf": setup_darcy_tf,
    "vorticity_tf": setup_vorticity_tf,
    "elasticity_tf": setup_elasticity_tf,
    "naca_tf": setup_naca_tf,
}


def setup(cfg: BenchmarkConfig, data_path=None, **kw) -> Problem:
    try:
        setup_fn = SETUPS[cfg.name]
    except KeyError:
        raise ValueError(
            f"no setup registered for benchmark {cfg.name!r}; register one "
            "with train.benchmarks.register_setup (or "
            "position_induced_transformer_tpu.register_benchmark). "
            f"Available: {sorted(SETUPS)}"
        ) from None
    return setup_fn(cfg, data_path, **kw)


def register_setup(
    name: str,
    setup_fn: Callable[..., Problem],
    overwrite: bool = False,
) -> Callable[..., Problem]:
    """Register a user-defined problem setup under ``name``.

    ``setup_fn(cfg, data_path=None, ntrain=None, ntest=None) -> Problem``
    is called by every entry point (runner.train, evaluate, infer, serve).
    The reference has no such hook — a new PDE means a new driver script
    (e.g. /root/reference/train_burgers.py); here it is one registered
    function reusing the framework's models/geometry/loop. See
    examples/custom_problem.py for a complete user-defined benchmark.
    """
    if name in SETUPS and not overwrite:
        raise ValueError(
            f"setup {name!r} is already registered; pass overwrite=True "
            "to replace it"
        )
    SETUPS[name] = setup_fn
    return setup_fn


def host_setup_context():
    """Context manager placing setup's eager array math on the host CPU
    backend instead of the accelerator.

    On a TPU backend every eager op in a ``setup_*`` (normalizer fit,
    distance-matrix builders, quantile thresholds, even reshapes) is a
    separate device dispatch — and in this environment a separate remote
    compile, observed at seconds-to-minutes each when the relay degrades
    (CLAUDE.md). None of that math needs the accelerator: under this
    context it runs on the CPU backend, and the caller uploads the
    finished arrays in one batched :func:`jax.device_put`
    (:func:`commit_problem`). Used by the serving/inference startup path
    (``evaluate.Predictor``), where the data split is tiny; full training
    setups keep the accelerator (per-sample locality thresholds at NACA
    scale are far faster there). No-op on CPU backends. Opt out globally
    with ``PIT_SETUP_HOST=never``.
    """
    import os
    from contextlib import nullcontext

    import jax

    if os.environ.get("PIT_SETUP_HOST") == "never":
        return nullcontext()
    if jax.default_backend() == "cpu":
        return nullcontext()
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return nullcontext()
    return jax.default_device(cpu)


def commit_problem(problem: Problem, device=None) -> Problem:
    """Upload a host-built :class:`Problem`'s array pytrees to ``device``
    (default: the first default-backend device) in batched transfers.

    Counterpart of :func:`host_setup_context`: jit arguments must live on
    the execution device, and a single ``jax.device_put`` of each pytree
    replaces the per-array round-trips setup would otherwise make."""
    import jax

    if device is None:
        if jax.default_backend() == "cpu":
            return problem
        device = jax.local_devices()[0]
    put = lambda t: jax.device_put(t, device)
    return dataclasses.replace(
        problem,
        geom=None if problem.geom is None else put(problem.geom),
        train_data=put(problem.train_data),
        test_data=put(problem.test_data),
    )
