"""Multi-chip evidence at REFERENCE shapes on the virtual 8-device CPU mesh.

The correctness of the DP/TP/SP shardings is pinned by tests/test_parallel.py
at toy sizes; this script produces the *scaling evidence* (VERDICT r1 item 9):
for the reference-size Burgers train step on a 4x2 ('data','model') mesh and
the sequence-sharded Darcy ZSSR decode at the full 421^2 output mesh on an
8-device 'data' axis, it lowers the jitted program, counts the XLA
collectives GSPMD inserted (all-reduce / all-gather / collective-permute /
reduce-scatter / all-to-all), reports per-device memory from the compiled
executable, and times one execution.

Writes MULTICHIP_EVIDENCE.json (summarized in BASELINE.md). Run with no
TPU required: the script self-provisions the virtual CPU platform exactly
like __graft_entry__.dryrun_multichip.
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import __graft_entry__ as ge

devices = ge._provision_cpu_devices(8)

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

from position_induced_transformer_tpu import configs
from position_induced_transformer_tpu.parallel import (
    make_mesh,
    replicate_tree,
    sequence_shard_geometry,
    shard_state,
)
from position_induced_transformer_tpu.train import benchmarks, runner
from position_induced_transformer_tpu.train.loop import (
    epoch_permutation,
    make_optimizer,
    make_train_epoch,
)

_COLLECTIVES = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)


def collective_counts(hlo_text: str) -> dict:
    counts = {}
    for c in _COLLECTIVES:
        # count op instances (e.g. "all-reduce.3 = ..."), not string mentions
        counts[c] = len(
            re.findall(rf"= [\w\[\]{{}},/ ]*{c}(?:-start)?(?:\.\d+)?\(", hlo_text)
        )
    return counts


def memory_stats(compiled) -> dict:
    try:
        m = compiled.memory_analysis()
        return {
            "argument_mb": round(m.argument_size_in_bytes / 2**20, 1),
            "output_mb": round(m.output_size_in_bytes / 2**20, 1),
            "temp_mb": round(m.temp_size_in_bytes / 2**20, 1),
            "generated_code_mb": round(
                m.generated_code_size_in_bytes / 2**20, 2
            ),
        }
    except Exception as e:
        return {"unavailable": str(e)[:100]}


def dp_tp_train_step():
    """Full-size Burgers train step (L=1024 -> 256 latent, hid 64, bs 8)
    over a 4x2 ('data','model') mesh: DP batch sharding + TP over MLP
    columns/rows and attention heads."""
    mesh = make_mesh(n_data=4, n_model=2, devices=devices)
    cfg = configs.BURGERS
    problem = benchmarks.setup(cfg, ntrain=64, ntest=16)
    optimizer = make_optimizer(cfg.lr, 8 * 500)
    state = runner.init_state(problem, optimizer, seed=0)
    state = shard_state(mesh, state, n_head=cfg.model.n_head)
    geom = replicate_tree(mesh, problem.geom)
    data = replicate_tree(mesh, problem.train_data)
    train_epoch = make_train_epoch(problem.task, optimizer, mesh=mesh)
    perm = epoch_permutation(0, 64, cfg.batch_size)

    lowered = train_epoch.lower(state, geom, data, perm)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    state2, loss = jax.block_until_ready(train_epoch(state, geom, data, perm))
    t0 = time.perf_counter()
    perm2 = epoch_permutation(1, 64, cfg.batch_size)
    state2, loss = jax.block_until_ready(train_epoch(state2, geom, data, perm2))
    dt = time.perf_counter() - t0
    # verify params really are distributed: a TP-sharded leaf's per-device
    # shard is half the logical size on the 2-way model axis
    mlp1 = state2.params["en_layer"]["mlp1"]["kernel"]
    shard_shape = mlp1.sharding.shard_shape(mlp1.shape)
    return {
        "mesh": dict(mesh.shape),
        "config": "burgers full size (1024->256, hid 64, H2, B5, bs 8)",
        "collectives": collective_counts(hlo),
        "memory": memory_stats(compiled),
        "epoch_seconds_cpu": round(dt, 3),
        "loss_finite": bool(jnp.isfinite(loss)),
        "mlp1_kernel_logical": list(mlp1.shape),
        "mlp1_kernel_per_device_shard": list(shard_shape),
    }


def sp_zssr_decode():
    """Sequence-sharded Darcy ZSSR decode at the full 421^2 output mesh:
    177,241 decoder query rows distributed over an 8-device 'data' axis,
    latent cloud replicated (no ring needed — SURVEY.md §5)."""
    mesh = make_mesh(n_data=8, n_model=1, devices=devices)
    cfg = configs.DARCY
    s = 421
    geom = benchmarks.darcy_geometry(cfg, s)
    model = benchmarks._make_model(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).random((2, s * s, 1)), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), geom, x)
    n_rows = geom.dist_up.shape[0]  # 177,241: no power-of-two divisor
    geom_sharded = sequence_shard_geometry(mesh, geom, pad=True)
    params = replicate_tree(mesh, params)
    x = replicate_tree(mesh, x)

    fwd = jax.jit(lambda p, g, xx: model.apply(p, g, xx)[:, :n_rows])
    lowered = fwd.lower(params, geom_sharded, x)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    out = jax.block_until_ready(fwd(params, geom_sharded, x))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fwd(params, geom_sharded, x))
    dt = time.perf_counter() - t0
    d = geom_sharded.dist_up
    shard_rows = d.sharding.shard_shape(d.shape)[0]
    return {
        "mesh": dict(mesh.shape),
        "config": f"darcy ZSSR decode at {s}^2 (dist_up {d.shape[0]}x{d.shape[1]})",
        "collectives": collective_counts(hlo),
        "memory": memory_stats(compiled),
        "forward_seconds_cpu": round(dt, 3),
        "dist_up_total_mb": round(d.size * 4 / 2**20, 1),
        "dist_up_rows_per_device": shard_rows,
        "dist_up_per_device_mb": round(shard_rows * d.shape[1] * 4 / 2**20, 1),
        "out_shape": list(out.shape),
        "out_finite": bool(jnp.all(jnp.isfinite(out))),
    }


def pp_pipelined_forward():
    """GPipe stage-split forward of a deep processor at reference width:
    vorticity-size PiT (hid 256, 2 heads) with 8 processor blocks over a
    4-stage mesh, 4 microbatches — collective-permute per tick moves the
    (micro, L_ltt, hid) activations over the stage axis."""
    from position_induced_transformer_tpu.parallel import (
        make_pipelined_apply,
        make_stage_mesh,
    )
    from position_induced_transformer_tpu.models import PiT, build_geometry

    mesh = make_stage_mesh(4, devices=devices[:4])
    ltt = jnp.asarray(
        np.random.default_rng(1).random((256, 2)), jnp.float32
    )
    qry = jnp.asarray(
        np.random.default_rng(2).random((4096, 2)), jnp.float32
    )
    geom = build_geometry(
        qry, ltt, qry, metric="euclidean", en_loc=0.02, de_loc=0.02
    )
    model = PiT(
        space_dim=2, in_dim=10, out_dim=1, hid_dim=256, n_head=2,
        n_blocks=8, en_loc=0.02, de_loc=0.02,
    )
    x = jnp.asarray(
        np.random.default_rng(3).random((8, 4096, 10)), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), geom, x)["params"]
    apply = make_pipelined_apply(model, mesh, n_micro=4)
    fwd = jax.jit(apply)
    lowered = fwd.lower(params, geom, x)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    out = jax.block_until_ready(fwd(params, geom, x))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fwd(params, geom, x))
    dt = time.perf_counter() - t0
    return {
        "mesh": dict(mesh.shape),
        "config": "vorticity-width PiT, 8 processor blocks over 4 stages, "
                  "4 microbatches (bs 8, L 4096 -> ltt 256, hid 256)",
        "collectives": collective_counts(hlo),
        "forward_seconds_cpu": round(dt, 3),
        "per_stage_blocks": 2,
        "out_shape": list(out.shape),
        "out_finite": bool(jnp.all(jnp.isfinite(out))),
    }


def dp_elasticity_batched_kernel():
    """The two round-4 dryrun additions, with HLO accounting (VERDICT r4
    item 8). (a) PRODUCTION elasticity epoch at data=8 through
    runner-built pieces (lazy per-batch geometry + setup thresholds +
    circular band metadata); (b) the fused batched kernel itself —
    position_attention_batched with thr + circular band, interpret-mode
    Pallas body on this CPU mesh — batch-sharded over 'data' so the
    custom_partitioning batch rule (kernels/partitioning.py) does the
    SPMD split; forward AND backward (the per-sample (B, H) dScale is
    reduced OUTSIDE the kernel, so its sum over the sharded batch must
    show up as a collective)."""
    from position_induced_transformer_tpu.data import synthetic
    from position_induced_transformer_tpu.data.meshes import angular_sort_perm
    from position_induced_transformer_tpu.kernels import (
        BandSpec,
        band_tile_rows,
        position_attention_batched,
    )
    from position_induced_transformer_tpu.ops.locality import (
        batched_band_starts,
        batched_topk_thresholds,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(n_data=8, n_model=1, devices=devices)

    # (a) production epoch, loss parity vs single device
    cfg = dataclasses.replace(configs.ELASTICITY, batch_size=16)
    kw = dict(epochs=1, ntrain=2 * cfg.batch_size, ntest=8, verbose=False)
    _, _, h_single = runner.train(cfg, **kw)
    _, _, h_dp = runner.train(cfg, mesh="data=8", **kw)
    np.testing.assert_allclose(
        h_dp[-1]["train_loss"], h_single[-1]["train_loss"], rtol=1e-4
    )

    # (b) fused kernel under GSPMD: real angle-sorted clouds, setup
    # thresholds + circular band, interpret-mode kernel body
    B, L, H, D = 8, 972, 2, 64
    _, ext, _ = synthetic.elasticity(n=B, L=L)
    perm = angular_sort_perm(ext)
    ext = np.take_along_axis(ext, perm[..., None], axis=1)
    m = jnp.asarray(ext)
    loc = 0.02
    thr = batched_topk_thresholds(m, m, loc)
    band = batched_band_starts(
        m, m, thr, band_tile_rows(L), circular=True
    )
    spec = None if band is None else BandSpec(*band)
    lmda = jnp.asarray(
        np.random.default_rng(0).standard_normal((H, 1, 1)), jnp.float32
    )
    u = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, L, D)), jnp.float32
    )

    def loss(lmda, m, u, thr):
        out = position_attention_batched(
            m, m, lmda, u, loc, thr, spec, interpret=True
        )
        return jnp.sum(out * out)

    grad = jax.jit(jax.grad(loss, argnums=(0, 2)))
    # single-device reference values
    g_l_1, g_u_1 = jax.block_until_ready(grad(lmda, m, u, thr))

    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    m_s = jax.device_put(m, shard)
    u_s = jax.device_put(u, shard)
    thr_s = jax.device_put(thr, shard)
    lmda_s = jax.device_put(lmda, repl)
    lowered = grad.lower(lmda_s, m_s, u_s, thr_s)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    g_l, g_u = jax.block_until_ready(grad(lmda_s, m_s, u_s, thr_s))
    np.testing.assert_allclose(
        np.asarray(g_l), np.asarray(g_l_1), rtol=2e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_u), np.asarray(g_u_1), rtol=2e-5, atol=1e-5
    )
    # placement proof: the sharded-batch operand is split B/8 per device
    per_dev_rows = u_s.sharding.shard_shape(u_s.shape)[0]
    counts = collective_counts(hlo)
    return {
        "mesh": dict(mesh.shape),
        "production_epoch": {
            "config": "elasticity full width (972-pt clouds, hid 256, "
                      "bs 16), runner.train(mesh='data=8')",
            "train_loss_single": round(float(h_single[-1]["train_loss"]), 6),
            "train_loss_dp": round(float(h_dp[-1]["train_loss"]), 6),
            "loss_parity_rtol": 1e-4,
        },
        "fused_kernel_custom_partitioning": {
            "config": f"position_attention_batched fwd+bwd, B={B} L={L} "
                      f"H={H} D={D}, thr + circular band "
                      f"(width {0 if spec is None else spec.width}), "
                      "interpret-mode kernel body, batch over P('data')",
            "collectives": counts,
            "batch_rows_per_device": per_dev_rows,
            "grad_parity_vs_single_device": "rtol 2e-5",
            "dscale_reduction_is_collective": counts["all-reduce"] > 0,
        },
    }


def sp_zssr_evaluate_path():
    """The production `evaluate --zssr --mesh data=8` decode path
    (train/evaluate.py:162-178): darcy problem at the FULL 421^2 query
    grid, geometry sequence-sharded with PADDED uneven shards
    (177,241 = 8*22156 arbitrary-remainder rows), jitted task.forward —
    the exact program evaluate/predict run, lowered for HLO accounting."""
    mesh = make_mesh(n_data=8, n_model=1, devices=devices)
    cfg = configs.DARCY
    problem = benchmarks.setup(
        cfg, ntrain=8, ntest=4, downsampling=1
    )
    optimizer = make_optimizer(cfg.lr, 10)
    state = runner.init_state(problem, optimizer, seed=0)
    geom_sharded = sequence_shard_geometry(mesh, problem.geom, pad=True)
    params = replicate_tree(mesh, state.params)
    data = replicate_tree(mesh, problem.test_data)
    batch = jax.tree_util.tree_map(lambda a: a[:4], data)
    fwd = jax.jit(problem.task.forward)
    lowered = fwd.lower(params, geom_sharded, batch)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    out = jax.block_until_ready(fwd(params, geom_sharded, batch))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fwd(params, geom_sharded, batch))
    dt = time.perf_counter() - t0
    # single-device parity on the same params
    out1 = jax.block_until_ready(
        jax.jit(problem.task.forward)(state.params, problem.geom, batch)
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out1), rtol=5e-5, atol=1e-5
    )
    d = geom_sharded.dist_up
    return {
        "mesh": dict(mesh.shape),
        "config": "evaluate --zssr --mesh data=8 decode program "
                  "(darcy 421^2, task.forward on sequence-sharded geometry)",
        "collectives": collective_counts(hlo),
        "memory": memory_stats(compiled),
        "forward_seconds_cpu": round(dt, 3),
        "dist_up_rows_per_device": d.sharding.shard_shape(d.shape)[0],
        "decode_parity_vs_single_device": "rtol 5e-5",
        "out_shape": list(out.shape),
    }


def pp_production_training():
    """PRODUCTION pipeline-parallel training at the full reference Sod
    shape (L=1024 -> 256 latent, hid 32, 2 blocks, bs 8 — the reference
    config whose block count divides 2 stages): runner.train(mesh='stage=2')
    must reproduce the single-device epoch loss."""
    cfg = configs.get("sod")
    kw = dict(epochs=1, ntrain=4 * cfg.batch_size, ntest=8, verbose=False)
    t0 = time.perf_counter()
    _, _, h_single = runner.train(cfg, **kw)
    t_single = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, _, h_pp = runner.train(cfg, mesh="stage=2", **kw)
    t_pp = time.perf_counter() - t0
    single, pp = h_single[-1]["train_loss"], h_pp[-1]["train_loss"]
    np.testing.assert_allclose(pp, single, rtol=1e-4)
    return {
        "mesh": {"stage": 2},
        "config": "sod full size (1024->256, hid 32, H1, B2, bs 8), "
                  "runner.train(mesh='stage=2'), 4 train batches",
        "train_loss_single": round(float(single), 6),
        "train_loss_pipelined": round(float(pp), 6),
        "loss_parity_rtol": 1e-4,
        "wall_seconds_cpu": {"single": round(t_single, 1), "pp": round(t_pp, 1)},
    }


CASES = {
    "dp_tp_train_step": dp_tp_train_step,
    "sp_zssr_decode": sp_zssr_decode,
    "pp_pipelined_forward": pp_pipelined_forward,
    "pp_production_training": pp_production_training,
    "dp_elasticity_batched_kernel": dp_elasticity_batched_kernel,
    "sp_zssr_evaluate_path": sp_zssr_evaluate_path,
}

if __name__ == "__main__":
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "MULTICHIP_EVIDENCE.json",
    )
    results = {}
    if os.path.exists(out):
        try:
            results = json.load(open(out))
        except Exception:
            pass
    results["n_devices"] = len(devices)
    results["platform"] = devices[0].platform
    names = sys.argv[1:] or list(CASES)
    for name in names:
        results[name] = CASES[name]()
        print(json.dumps({name: results[name]}, indent=1), flush=True)
        # temp file + atomic replace: a concurrent reader must never see a
        # truncated JSON (its except-pass merge would restart from {})
        tmp = out + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=1)
        os.replace(tmp, out)
