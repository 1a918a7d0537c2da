"""Unified benchmark runner: the framework's L4 layer.

Replaces the reference's seven driver scripts with one loop
(SURVEY.md §1 L4). Per epoch it executes a single jitted whole-epoch train
scan and a jitted eval scan, prints the same columns the reference prints
(epoch, seconds, train loss, test metrics — e.g. train_burgers.py:114), and
appends structured JSONL metrics. Checkpoints via train/checkpoint.py.
"""

from __future__ import annotations

import json
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from position_induced_transformer_tpu.configs import BenchmarkConfig, get
from position_induced_transformer_tpu.ops.metrics import rel_lp_norm, rel_max_norm
from position_induced_transformer_tpu.train import benchmarks
from position_induced_transformer_tpu.train import checkpoint as ckpt
from position_induced_transformer_tpu.train.loop import (
    TrainState,
    epoch_permutation,
    eval_permutation,
    make_eval_epoch,
    make_optimizer,
    make_train_epoch,
)


def init_state(problem, optimizer, seed: int = 0) -> TrainState:
    """Initialize parameters (reference inits under torch seed 0 —
    pit.py:3) and optimizer state."""
    data = jax.tree_util.tree_map(lambda a: a[:2], problem.train_data)
    if problem.init_fn is not None:
        variables = problem.init_fn(jax.random.PRNGKey(seed), data)
    else:
        geom = problem.geom
        if problem.task.geom_fn is not None:
            geom = problem.task.geom_fn(data)
        variables = problem.model.init(
            jax.random.PRNGKey(seed), geom, data["x"]
        )
    params = variables["params"]
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def default_metrics(out_dim: int):
    return {
        "rel_l1": partial(rel_lp_norm, out_dim=out_dim, p=1),
        "rel_l2": partial(rel_lp_norm, out_dim=out_dim, p=2),
        "rel_max": partial(rel_max_norm, out_dim=out_dim),
    }


def train(
    config: "BenchmarkConfig | str",
    data_path: Optional[str] = None,
    epochs: Optional[int] = None,
    ntrain: Optional[int] = None,
    ntest: Optional[int] = None,
    seed: Optional[int] = None,
    log_path: Optional[str] = None,
    checkpoint_path: Optional[str] = None,
    verbose: bool = True,
    setup_kwargs: Optional[dict] = None,
    profile_dir: Optional[str] = None,
    history_csv: Optional[str] = None,
    history_plot: Optional[str] = None,
    resume_from: Optional[str] = None,
    checkpoint_every: Optional[int] = None,
    schedule_epochs: Optional[int] = None,
    sync_every: int = 1,
    mesh=None,
    model_variant: Optional[str] = None,
    grad_accum: int = 1,
):
    """Train a benchmark end to end; returns (problem, state, history).

    ``mesh``: a ``jax.sharding.Mesh``, a spec string (``'auto'`` |
    ``'data=N[,model=M]'`` | ``'stage=K'``), or ``None`` (single device).
    With a data/model mesh the batch is sharded over the 'data' axis,
    parameters and Adam moments are tensor-parallel over 'model' (MLP
    columns/rows, attention heads — parallel/sharding.py), and XLA GSPMD
    inserts the gradient all-reduce over ICI. ``'stage=K'`` instead runs
    the processor blocks GPipe pipeline-parallel over K devices
    (parallel/pipeline.py; torch-family fixed-mesh benchmarks, n_blocks
    divisible by K). All numerically identical to single-device training
    (tests/test_parallel.py). The reference has no parallelism at all
    (SURVEY.md §2.4).

    ``resume_from``: restore params + optimizer state + step from a
    checkpoint and continue training (elastic recovery — the reference can
    only save at the end, SURVEY.md §5). ``checkpoint_every``: also write
    the checkpoint every N epochs, enabling mid-run recovery.
    ``schedule_epochs``: cosine-decay horizon when it differs from
    ``epochs`` (a partial run that will be resumed must decay over the
    full intended horizon).

    ``grad_accum``: accumulate gradients over this many sequential
    microbatches per optimizer step (same trajectory, ~1/K the peak
    activation memory — see :func:`make_train_epoch`). The benchmark
    batch size must divide evenly into microbatches.

    ``sync_every``: read the per-epoch metric scalars back from the device
    every N epochs (0 = only at the end). A device->host scalar read
    through this environment's TPU tunnel stalls the dispatch pipeline
    ~0.1 s, which dominates fast benchmarks; deferring the readback keeps
    the device saturated. With N != 1 the per-row ``seconds`` is the mean
    over the sync group (epochs are only observable at sync points)."""
    cfg = get(config) if isinstance(config, str) else config
    if model_variant:
        import dataclasses

        cfg = dataclasses.replace(cfg, model_variant=model_variant)
    problem = benchmarks.setup(
        cfg, data_path, ntrain=ntrain, ntest=ntest, **(setup_kwargs or {})
    )
    epochs = epochs if epochs is not None else cfg.epochs
    seed = seed if seed is not None else cfg.seed

    n_batches = problem.n_train // cfg.batch_size
    if n_batches == 0:
        raise ValueError(
            f"ntrain={problem.n_train} yields zero whole training batches "
            f"at batch_size={cfg.batch_size} (the epoch drops the "
            "remainder, like the reference's ntrain//batch iteration "
            "count) — pass --ntrain >= the benchmark batch size"
        )
    # reference: train_burgers.py:56
    total_steps = (schedule_epochs or epochs) * n_batches
    optimizer = make_optimizer(
        cfg.lr, total_steps,
        # TF-family tasks train with the keras Adam formulation so their
        # dynamics match tf.keras.optimizers.Adam (loop._keras_adam)
        flavor="keras" if problem.task.keras_adam else "adam",
        warmup_steps=getattr(cfg, "warmup_steps", 0),
    )
    state = init_state(problem, optimizer, seed)

    def _payload(state):
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        for name, norm in (
            ("x_normalizer", problem.x_normalizer),
            ("y_normalizer", problem.y_normalizer),
        ):
            if norm is not None:
                payload[name] = {"mean": norm.mean, "std": norm.std}
        return payload

    start_epoch = 0
    if resume_from:
        restored = ckpt.restore(resume_from, target=_payload(state))
        state = TrainState(
            restored["params"], restored["opt_state"],
            jnp.asarray(restored["step"], jnp.int32),
        )
        start_epoch = int(state.step) // max(1, n_batches)

    from position_induced_transformer_tpu.parallel.sharding import (
        data_axis_size,
        parse_mesh_spec,
        replicate_tree,
        shard_state,
    )

    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    if grad_accum > 1 and cfg.batch_size % grad_accum:
        raise ValueError(
            f"batch_size {cfg.batch_size} is not divisible into "
            f"--grad-accum {grad_accum} microbatches"
        )
    # batch size each FORWARD sees: grad-accum splits the optimizer batch
    # into sequential microbatches before the model runs, so downstream
    # schedules (GPipe microbatching) must be sized from this, not from
    # cfg.batch_size
    fwd_bs = cfg.batch_size // grad_accum

    mesh = parse_mesh_spec(mesh)
    pp_micro = 0  # microbatch count when pipeline-parallel ('stage=K')
    if mesh is not None and "stage" in mesh.shape:
        from position_induced_transformer_tpu.parallel.pipeline import (
            enable_pipeline,
        )

        state, pp_micro = enable_pipeline(
            problem, state, mesh, batch_size=fwd_bs
        )  # also replicates geom + data splits over the stage mesh
        # Trade-off: the GPipe schedule is sized from fwd_bs (the training
        # forward batch).  Under grad-accum, eval still runs full
        # cfg.batch_size batches, so eval sees fewer microbatches than
        # stages and a larger pipeline bubble.  Correctness is unaffected
        # (eval batches are rounded to a pp_micro multiple); eval is a tiny
        # fraction of the epoch, so we keep one schedule.
        mesh = None  # no 'data' axis: epoch functions run unsharded inputs
    elif mesh is not None:
        n_data = data_axis_size(mesh)
        if cfg.batch_size % n_data:
            raise ValueError(
                f"batch_size {cfg.batch_size} is not divisible by the mesh "
                f"data (x dcn) axis size ({n_data})"
            )
        state = shard_state(mesh, state, n_head=cfg.model.n_head)
        if problem.geom is not None:
            problem.geom = replicate_tree(mesh, problem.geom)
        problem.train_data = replicate_tree(mesh, problem.train_data)
        problem.test_data = replicate_tree(mesh, problem.test_data)

    if grad_accum > 1:
        if mesh is not None and fwd_bs % data_axis_size(mesh):
            raise ValueError(
                f"microbatch size {fwd_bs} (batch {cfg.batch_size} / "
                f"grad-accum {grad_accum}) is not divisible by the mesh "
                f"data (x dcn) axis size ({data_axis_size(mesh)})"
            )
        if pp_micro and fwd_bs % pp_micro:
            # unreachable unless PIT_PP_MICRO forces a non-divisor —
            # enable_pipeline picks its schedule from fwd_bs above
            raise ValueError(
                f"microbatch size {fwd_bs} is not divisible into the "
                f"pipeline schedule's {pp_micro} GPipe microbatches"
            )
    train_epoch = make_train_epoch(
        problem.task, optimizer, mesh=mesh, grad_accum=grad_accum
    )
    metrics = None if cfg.rollout_steps else default_metrics(cfg.model.out_dim)
    eval_epoch = make_eval_epoch(problem.task, metrics, mesh=mesh)
    eval_bs = min(cfg.eval_batch_size or cfg.batch_size, problem.n_test)
    if mesh is not None:
        # the eval batch axis must also divide over 'data' (x 'dcn')
        eval_bs = round_batch(eval_bs, data_axis_size(mesh))
    if pp_micro:
        # the GPipe schedule needs eval batches divisible into microbatches
        eval_bs = round_batch(eval_bs, pp_micro)
    eval_perm = eval_permutation(problem.n_test, eval_bs)
    n_eval = problem.n_test  # padded tail batch is masked, so every
    # test sample counts exactly once for any batch size

    # multi-host: every process runs the identical program (SPMD over the
    # global mesh — parallel/multihost.py conventions); stdout/JSONL/
    # artifact writes happen on process 0 only. Orbax checkpoint saves
    # stay collective (all processes call ckpt.save).
    main = jax.process_index() == 0
    verbose = verbose and main
    key = jax.random.PRNGKey(seed)
    history = []
    logf = open(log_path, "a") if (log_path and main) else None

    def normalize_row(ep, dt, train_loss, evals):
        denom = (
            n_batches if problem.task.batch_mean_loss
            else n_batches * cfg.batch_size
        )
        train_loss = float(train_loss) / denom
        evals = {k: float(v) / n_eval for k, v in evals.items()}
        if cfg.rollout_steps and not problem.task.trajectory_loss:
            # reference normalizes the summed per-step losses by steps
            # (train_vorticity.py:140-146); the stepwise rel-L2 metrics
            # are already per-step means
            evals["loss"] /= cfg.rollout_steps
            train_loss /= cfg.rollout_steps
        return {"epoch": ep, "seconds": dt, "train_loss": train_loss, **evals}

    pending = []  # deferred (epoch, device train_loss, device evals)
    group_t0 = time.perf_counter()

    def flush():
        nonlocal group_t0
        if not pending:
            return
        # force completion BEFORE taking the time: a scalar D2H read is the
        # only reliable sync through the TPU tunnel (block_until_ready is
        # not), and the group's epochs depend sequentially on each other,
        # so reading the last train_loss drains the whole pipeline. Without
        # this, `seconds` measures host dispatch only.
        float(pending[-1][1])
        for v in pending[-1][2].values():
            float(v)  # eval scalars are not upstream of train_loss
        dt = (time.perf_counter() - group_t0) / len(pending)
        for ep, train_loss, evals in pending:
            row = normalize_row(ep, dt, train_loss, evals)
            history.append(row)
            if verbose:
                print(
                    ep, f"{row['seconds']:.3f}", f"{row['train_loss']:.6f}",
                    *(
                        f"{v:.6f}" for k, v in row.items()
                        if k not in ("epoch", "seconds", "train_loss")
                    ),
                    flush=True,
                )
            if logf:
                logf.write(json.dumps(row) + "\n")
                logf.flush()
        pending.clear()
        group_t0 = time.perf_counter()

    # first epoch after the starting one pays no compile; on a fresh
    # 1-epoch run fall back to epoch 0 (trace includes compilation)
    profile_epoch = min(start_epoch + 1, epochs - 1) if profile_dir else -1
    last_periodic_save = -1
    for ep in range(start_epoch, epochs):
        # fold the epoch index in so resumed runs replay the same shuffles
        sub = jax.random.fold_in(key, ep)
        perm = epoch_permutation(sub, problem.n_train, cfg.batch_size)
        if ep == profile_epoch:
            from position_induced_transformer_tpu.utils.profiling import trace

            with trace(profile_dir):
                state, train_loss = train_epoch(
                    state, problem.geom, problem.train_data, perm
                )
                # scalar D2H read: the only reliable completion barrier
                # through the TPU tunnel (block_until_ready can return
                # early — CLAUDE.md); must happen INSIDE the trace or the
                # profiler stops before the device executes the epoch
                float(train_loss)
        else:
            state, train_loss = train_epoch(
                state, problem.geom, problem.train_data, perm
            )
        evals = eval_epoch(
            state, problem.geom, problem.test_data, eval_perm, problem.n_test
        )
        pending.append((ep, train_loss, evals))
        if sync_every and (ep + 1 - start_epoch) % sync_every == 0:
            flush()
        if (
            checkpoint_path
            and checkpoint_every
            and (ep + 1) % checkpoint_every == 0
        ):
            flush()
            ckpt.save(checkpoint_path, _payload(state))
            last_periodic_save = ep
            # don't attribute the synchronous save to the next epoch's
            # per-epoch 'seconds' column
            group_t0 = time.perf_counter()
    flush()
    if logf:
        logf.close()
    if (history_csv or history_plot) and main:
        save_history(history, history_csv, history_plot)
    if checkpoint_path and last_periodic_save != epochs - 1:
        # skip when the periodic save already wrote this exact state
        ckpt.save(checkpoint_path, _payload(state))
    return problem, state, history


def save_history(history, csv_path=None, plot_path=None):
    """Training-history artifacts (parity with the TF drivers' CSV +
    log-scale PNG, reference: tensorflow/1_InviscidBurgers/train.py:62-74)."""
    if not history:
        return
    keys = list(history[0].keys())
    if csv_path:
        with open(csv_path, "w") as f:
            f.write(",".join(keys) + "\n")
            for row in history:
                f.write(",".join(str(row.get(k, "")) for k in keys) + "\n")
    if plot_path:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(6, 4), dpi=120)
        epochs = [r["epoch"] for r in history]
        for k in keys:
            if k in ("epoch", "seconds"):
                continue
            plt.semilogy(epochs, [r[k] for r in history], label=k)
        plt.xlabel("epoch")
        plt.legend()
        plt.tight_layout()
        plt.savefig(plot_path)
        plt.close()


def padded_batches(n: int, batch_size: int):
    """Index arrays covering ALL ``n`` samples in static-size batches;
    the final partial batch repeats the last index (keeps one compiled
    shape — slice the concatenated outputs to ``[:n]`` to drop the
    duplicates). The single padded-tail convention shared by predict and
    the evaluate/infer rollout loops (the reference's predict loops
    cover every sample: train_burgers.py:118-126, DataLoader without
    drop_last)."""
    for i in range(0, n, batch_size):
        yield np.minimum(np.arange(i, i + batch_size), n - 1)


def round_batch(bs: int, k: int) -> int:
    """Round ``bs`` down to a multiple of ``k`` (floor ``k``) — the one
    divisibility convention shared by eval batching, GPipe microbatching
    and data-parallel predict (the padded tail then keeps every batch at
    exactly this size)."""
    return max(k, bs - bs % k) if k > 1 else bs


def predict(
    problem, state, data=None, batch_size: Optional[int] = None, mesh=None
):
    """Full-dataset predictions (reference final predict loops, e.g.
    train_burgers.py:118-126). ``mesh``: optional device mesh — batches are
    sharded over its 'data' axis (data-parallel inference); params,
    geometry and data are replicated over the mesh here, so the caller
    can pass single-device state directly (device_put is a no-op for
    already-placed trees)."""
    data = data if data is not None else problem.test_data
    n = data["x"].shape[0]
    bs = batch_size or problem.config.eval_batch_size or problem.config.batch_size
    bs = min(bs, n)
    # pipeline-parallel forward: every batch (incl. the padded tail)
    # must split into the schedule's microbatches
    bs = round_batch(bs, getattr(problem.task, "pp_micro", 0) or 1)
    params, geom = state.params, problem.geom
    if mesh is not None:
        from position_induced_transformer_tpu.parallel.sharding import (
            data_axis_size,
            replicate_tree,
        )

        bs = round_batch(bs, data_axis_size(mesh))
        # jit arguments must share a placement: a single-device state
        # (post-train or checkpoint-restored) meets the mesh-wide batch
        # constraint below only if replicated over the SAME mesh
        params = replicate_tree(mesh, params)
        geom = None if geom is None else replicate_tree(mesh, geom)
        data = replicate_tree(mesh, data)

        def fwd_fn(params, geom, batch):
            from position_induced_transformer_tpu.parallel.sharding import (
                shard_batch,
            )

            return problem.task.forward(params, geom, shard_batch(mesh, batch))

        fwd = jax.jit(fwd_fn)
    else:
        fwd = jax.jit(problem.task.forward)
    outs = []
    for idx in padded_batches(n, bs):
        batch = jax.tree_util.tree_map(lambda a: a[idx], data)
        outs.append(np.asarray(fwd(params, geom, batch)))
    return np.concatenate(outs, axis=0)[:n]
