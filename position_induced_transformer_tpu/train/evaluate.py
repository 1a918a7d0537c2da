"""Checkpoint evaluation, including Darcy zero-shot super-resolution.

Capability parity with the reference eval flows: final test metrics
(train_burgers.py:128-131), the 43^2-trained -> 421^2 ZSSR evaluation
(train_darcy.py:151-180), and TF-side ``evaluate.py`` scripts that rebuild
the model at a new resolution and transplant weights
(tensorflow/3_Darcy2D/evaluate.py:47-60). Here "rebuilding" is just binding
the same resolution-independent params to a new Geometry.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np

from position_induced_transformer_tpu.configs import get
from position_induced_transformer_tpu.ops.metrics import (
    rel_lp_norm,
    rel_max_norm,
)
from position_induced_transformer_tpu.train import benchmarks
from position_induced_transformer_tpu.train import checkpoint as ckpt
from position_induced_transformer_tpu.train.loop import TrainState
from position_induced_transformer_tpu.train.runner import predict


def _setup_accepts(cfg, kwarg: str) -> bool:
    """Whether the benchmark's setup function declares ``kwarg``.

    Capability detection rather than a hardcoded benchmark-name list, so
    user benchmarks registered via ``register_benchmark`` opt into
    framework behaviors by declaring the parameter: ``normalizers`` (an
    ``(x_norm, y_norm)`` pair fitted on the training split, passed back
    in at eval/infer time — the darcy pattern) and ``downsampling``
    (ZSSR evaluation mesh factor, ``evaluate --zssr``)."""
    import inspect

    setup_fn = benchmarks.SETUPS.get(cfg.name)
    if setup_fn is None:
        return False
    try:
        params = inspect.signature(setup_fn).parameters
    except (TypeError, ValueError):
        return False
    return kwarg in params


def _setup_accepts_normalizers(cfg) -> bool:
    return _setup_accepts(cfg, "normalizers")


def _checkpoint_normalizers(cfg, restored, setup_kwargs):
    """Inject training-time normalizer statistics from a restored
    checkpoint into benchmark setup kwargs (darcy family and any custom
    benchmark whose setup declares ``normalizers``: the eval/infer
    resolution must reuse the training-resolution statistics, bilinearly
    resized on apply — reference train_darcy.py:151-157)."""
    if _setup_accepts_normalizers(cfg) and "y_normalizer" in restored:
        if "x_normalizer" not in restored:
            raise ValueError(
                "checkpoint carries y_normalizer but no x_normalizer "
                "(predates the x-normalization fix); re-train or evaluate "
                "with freshly fitted statistics by renaming the checkpoint "
                "keys"
            )
        from position_induced_transformer_tpu.ops.normalization import (
            PixelWiseNormalizer,
        )

        # host numpy stats: restore may commit arrays to the accelerator
        # (checkpoint._restore_here), and setup under host_setup_context
        # must not mix committed devices in its eager normalize calls
        host = lambda d: {k: np.asarray(v) for k, v in d.items()}
        setup_kwargs["normalizers"] = (
            PixelWiseNormalizer(**host(restored["x_normalizer"])),
            PixelWiseNormalizer(**host(restored["y_normalizer"])),
        )
    return setup_kwargs


def _shuffle_perm(n: int) -> np.ndarray:
    """Seeded random n-cycle (derangement): pairings are uniform across
    the test set and deterministic. A plain roll-by-1 would be wrong for
    trajectory-major sample layouts (cylinder: sample i = trajectory k,
    step t, so i-1 is usually the SAME trajectory one frame earlier — a
    stale-but-right input, the easiest possible wrong pairing); the
    random cycle makes same-trajectory pairings a ~T/n rarity instead of
    the rule."""
    if n < 2:
        raise ValueError(
            "input_shuffle_ablation needs >= 2 test samples: with n=1 the "
            "only permutation is the identity, so the probe would compare "
            "the model against its own true pairing and report zero "
            "inflation regardless of whether the input is used"
        )
    order = np.random.default_rng(0).permutation(n)
    perm = np.empty(n, dtype=np.int64)
    perm[order] = np.roll(order, 1)
    return perm


def input_shuffle_ablation(problem, state, pred_true=None, mesh=None) -> dict:
    """Operator-learning probe: test rel-L2 with true inputs vs the input
    FUNCTIONS shuffled across test samples (targets and geometry fixed).

    A trained model whose error barely moves under the shuffle is not
    using the input function at all — it is regressing the target from
    query-local information (coordinates), which the reference's real
    datasets cannot be solved from (e.g. train_naca.py:7-15: 120-pt
    airfoil shape -> 4-variable C-grid field). Large inflation is direct
    evidence the model reads the operator argument; BASELINE.md's
    surrogate note records the full-budget numbers (3.5-57x on the
    round-5 surrogates).

    Benchmark-aware shuffling (by config name prefix, falling back to a
    generic input-frame shuffle for fixed-geometry benchmarks incl.
    registered user problems):

    - ``naca`` (torch family): the input shape is also the encoder source
      cloud, so the shuffled pairing recomputes the encoder locality
      thresholds (the model must still see a self-consistent geometry —
      otherwise the probe would measure mask corruption, not input use).
    - ``elasticity``: only the void-radius channels are shuffled; cloud
      coordinates (and therefore thresholds/bands) stay aligned with the
      targets.
    - default: the input frame ``x`` is shuffled across samples.

    Returns per-sample-mean rel-L2 under both pairings (the benchmark
    metric convention, ops/metrics.py).
    """
    from position_induced_transformer_tpu.train import runner

    cfg = problem.config
    data = dict(problem.test_data)
    n = int(data["y"].shape[0])
    perm = _shuffle_perm(n)
    if cfg.name.startswith("naca") and "mesh_in" in data:
        shuf = data["x"][perm]
        data["x"] = shuf
        data["mesh_in"] = shuf
        if "thr_down" in data:
            from position_induced_transformer_tpu.ops.locality import (
                batched_topk_thresholds,
            )

            data["thr_down"] = batched_topk_thresholds(
                data["mesh_ltt"], shuf, cfg.model.en_loc, cfg.metric
            )
    elif (
        cfg.name.startswith("elasticity")
        and data["x"].ndim == 3
        and data["x"].shape[-1] > 2
    ):
        x = np.asarray(data["x"]).copy()
        x[:, :, 2:] = x[perm][:, :, 2:]
        data["x"] = jax.numpy.asarray(x)
    else:
        data["x"] = data["x"][perm]
    if pred_true is None:
        pred_true = runner.predict(problem, state, mesh=mesh)
    pred_shuf = runner.predict(problem, state, data=data, mesh=mesh)
    y = np.asarray(problem.test_data["y"])

    def rl2(p):
        # predictions come out mesh-flattened; targets may be gridded
        p = np.asarray(p).reshape(y.shape[0], -1, y.shape[-1])
        yy = y.reshape(y.shape[0], -1, y.shape[-1])
        num = np.sqrt(((p - yy) ** 2).sum(1))
        den = np.sqrt((yy**2).sum(1)) + 1e-30
        return round(float((num / den).mean()), 6)

    return {
        "true_relL2": rl2(pred_true),
        "shuffled_inputs_relL2": rl2(pred_shuf),
    }


def evaluate(
    config: str,
    checkpoint_path: str,
    data_path: Optional[str] = None,
    ntest: Optional[int] = None,
    zssr: bool = False,
    zssr_downsampling: int = 1,
    save_pred: Optional[str] = None,
    plots_dir: Optional[str] = None,
    setup_kwargs: Optional[dict] = None,
    mesh=None,
    model_variant: Optional[str] = None,
    shuffle_ablation: bool = False,
) -> dict:
    """``mesh``: a Mesh / spec string ('auto' | 'data=N[,model=M]' |
    'stage=K') / None. With a data mesh, ZSSR decoding is
    sequence-parallel — the 421^2 = 177,241 decoder query rows are sharded
    over the 'data' axis (each device computes the attention rows for its
    slab against the replicated latent cloud, SURVEY.md §5 long-context) —
    and ordinary evaluation shards the batch (data parallelism).
    'stage=K' instead runs the forward GPipe pipeline-parallel over the
    processor blocks (torch-family fixed-mesh benchmarks)."""
    cfg = get(config) if isinstance(config, str) else config
    if model_variant:
        cfg = dataclasses.replace(cfg, model_variant=model_variant)
    restored = ckpt.restore(checkpoint_path)
    params = restored["params"] if "params" in restored else restored

    setup_kwargs = dict(setup_kwargs or {})
    if zssr:
        if not _setup_accepts(cfg, "downsampling"):
            raise ValueError(
                "--zssr needs a benchmark whose setup declares a "
                "'downsampling' kwarg (darcy family, or a registered "
                f"benchmark following that pattern); {cfg.name!r} does not"
            )
        setup_kwargs["downsampling"] = zssr_downsampling  # 1 = full 421^2
    setup_kwargs = _checkpoint_normalizers(cfg, restored, setup_kwargs)
    ntrain = None
    if "normalizers" in setup_kwargs:
        # normalizer statistics come from the checkpoint, so the training
        # split is never touched — keep data loading/generation minimal
        # (matters at ZSSR scale: the full 421^2 synthetic train set costs
        # minutes to generate for nothing)
        ntrain = ntest or cfg.ntest
    problem = benchmarks.setup(
        cfg, data_path, ntrain=ntrain, ntest=ntest, **setup_kwargs
    )
    state = TrainState(params, None, 0)

    from position_induced_transformer_tpu.parallel.sharding import (
        parse_mesh_spec,
        replicate_tree,
        sequence_constrain_tf_geometry,
        sequence_shard_geometry,
    )

    mesh = parse_mesh_spec(mesh)
    if mesh is not None and "stage" in mesh.shape:
        # pipeline-parallel evaluation ('stage=K'): the predict loop runs
        # unsharded on top of the pipelined task (the schedule owns its
        # own 1-D mesh — parallel/pipeline.py enable_pipeline)
        from position_induced_transformer_tpu.parallel.pipeline import (
            enable_pipeline,
        )

        # serving-convention batch size => K microbatches (predict
        # pads every batch to a fixed size, so the schedule always sees
        # divisible batches)
        state, _ = enable_pipeline(
            problem, state, mesh,
            batch_size=cfg.eval_batch_size or cfg.batch_size,
        )
        mesh = None
    pred_mesh = mesh
    if mesh is not None:
        # checkpoint restore commits params to device 0; replicate them
        # over the mesh so they can meet sharded operands in one jit
        state = TrainState(replicate_tree(mesh, state.params), None, 0)
    if mesh is not None and zssr and problem.geom is not None:
        # sequence-parallel ZSSR decode: shard the decoder query rows over
        # 'data' (each device holds a slab of the (L_out, L_ltt) cross
        # matrix); the batch stays unsharded — rows are the long axis here
        if hasattr(problem.geom, "m_cross"):  # TF family
            orig_apply = problem.task.apply_fn
            problem.task = dataclasses.replace(
                problem.task,
                apply_fn=lambda p, g, b: orig_apply(
                    p, sequence_constrain_tf_geometry(mesh, g), b
                ),
            )
        else:
            problem.geom = sequence_shard_geometry(
                mesh, problem.geom, pad=True
            )
        pred_mesh = None

    if cfg.rollout_steps:
        if shuffle_ablation:
            raise ValueError(
                "--shuffle-ablation probes the one-step operator map; "
                f"{cfg.name!r} evaluates an in-graph rollout (shuffling "
                "the initial frame would measure trajectory divergence, "
                "not input use)"
            )
        return _evaluate_rollout(
            cfg, problem, state, zssr, save_pred, mesh=pred_mesh,
            plots_dir=plots_dir,
        )

    pred = predict(problem, state, mesh=pred_mesh)
    true = np.asarray(problem.test_data["y"])[: pred.shape[0]]
    n = pred.shape[0]
    out_dim = cfg.model.out_dim
    result = {
        "benchmark": cfg.name,
        "n_test": n,
        "zssr": zssr,
        "rel_l1": float(rel_lp_norm(true, pred, out_dim, 1)) / n,
        "rel_l2": float(rel_lp_norm(true, pred, out_dim, 2)) / n,
        "rel_max": float(rel_max_norm(true, pred, out_dim)) / n,
    }
    # rel-L1 quartiles (reference: tensorflow/1_InviscidBurgers/utils.py:27-32,
    # printed by the TF drivers after predict)
    from position_induced_transformer_tpu.ops.metrics import rel_l1_quartiles

    q25, q50, q75 = rel_l1_quartiles(
        true.reshape(n, -1, out_dim), pred.reshape(n, -1, out_dim)
    )
    result["rel_l1_quartiles"] = [float(q25), float(q50), float(q75)]
    if shuffle_ablation:
        result["shuffle_ablation"] = input_shuffle_ablation(
            problem, state, pred_true=pred, mesh=pred_mesh
        )
    # capability gate, not a name gate: any benchmark (incl. registered
    # user problems) providing raw test trajectories gets the closed-loop
    # eval rollout
    if "test_trajectories" in problem.extras:
        result.update(_cylinder_rollout(cfg, problem, state))
    from position_induced_transformer_tpu.parallel.multihost import (
        is_main,
    )

    if plots_dir and is_main():
        from position_induced_transformer_tpu.train.plots import (
            save_benchmark_plots,
            save_step_error_plot,
        )

        save_benchmark_plots(problem, pred, plots_dir)
        if "rollout_rel_l2_step" in result:  # cylinder eval rollout
            save_step_error_plot(result["rollout_rel_l2_step"], plots_dir)
    if save_pred and is_main():
        from scipy.io import savemat

        savemat(save_pred, {"pred": pred, "true": true})
    return result


def _cylinder_rollout(cfg, problem, state):
    """10-step closed-loop rollout from each test trajectory's initial state
    (reference: train_cylinder.py:137-157). Runs in padded batches of the
    eval batch size (rounded to any pipeline microbatch count) rather than
    one giant jit call — trajectory counts need not divide the GPipe
    schedule, and one (N, L, 3, steps) unroll at full N is HBM-hungry."""
    import jax

    from position_induced_transformer_tpu.train.runner import (
        padded_batches,
        round_batch,
    )

    traj = np.asarray(problem.extras["test_trajectories"])  # (N, L, 3, T)
    n = traj.shape[0]
    steps = traj.shape[-1] - 1
    bs = min(cfg.eval_batch_size or cfg.batch_size, n)
    bs = round_batch(bs, getattr(problem.task, "pp_micro", 0) or 1)
    rollout = jax.jit(
        lambda p, g, x: problem.task.rollout(p, g, x, steps)
    )
    x0 = traj[..., 0]  # (N, L, 3)
    preds = [
        np.asarray(rollout(state.params, problem.geom, x0[idx]))
        for idx in padded_batches(n, bs)
    ]
    pred = np.concatenate(preds, axis=0)[:n]  # (N, L, 3, steps)
    true = traj[..., 1:]
    from position_induced_transformer_tpu.ops.metrics import rel_norm_step

    step_err = np.asarray(rel_norm_step(true, pred))
    return {
        "rollout_steps": steps,
        "rollout_rel_l2_step": [float(v) for v in step_err],
        "rollout_rel_l2_mean": float(step_err.mean()),
    }


def _evaluate_rollout(
    cfg, problem, state, zssr, save_pred, mesh=None, plots_dir=None
):
    """Autoregressive rollout metrics (reference: train_vorticity.py:148-161;
    stepwise/trajectory rel-L2 per tensorflow/4_Vorticity/utils.py).
    ``mesh``: optional device mesh — batches shard over its 'data' axis."""
    import jax

    from position_induced_transformer_tpu.ops.metrics import (
        rel_norm_step,
        rel_norm_traj,
    )

    from position_induced_transformer_tpu.train.runner import round_batch

    steps = cfg.rollout_steps
    bs = min(cfg.eval_batch_size or cfg.batch_size, problem.n_test)
    # pipelined task: every padded batch must split into microbatches
    bs = round_batch(bs, getattr(problem.task, "pp_micro", 0) or 1)
    data = problem.test_data
    n = data["x"].shape[0]
    if mesh is not None:
        from position_induced_transformer_tpu.parallel.sharding import (
            data_axis_size,
            shard_batch,
        )

        bs = round_batch(bs, data_axis_size(mesh))

        rollout = jax.jit(
            lambda p, g, x: problem.task.rollout(
                p, g, shard_batch(mesh, {"x": x})["x"], steps
            )
        )
    else:
        rollout = jax.jit(
            lambda p, g, x: problem.task.rollout(p, g, x, steps)
        )
    from position_induced_transformer_tpu.train.runner import padded_batches

    preds = [
        np.asarray(rollout(state.params, problem.geom, data["x"][idx]))
        for idx in padded_batches(n, bs)
    ]
    pred = np.concatenate(preds, axis=0)[:n]  # (N, L, steps)
    true = np.asarray(data["y"])[: pred.shape[0]]
    step_err = np.asarray(rel_norm_step(true, pred))
    result = {
        "benchmark": cfg.name,
        "n_test": int(pred.shape[0]),
        "zssr": zssr,
        "rollout_steps": steps,
        "rel_l2_step": [float(v) for v in step_err],
        "rel_l2_traj": float(rel_norm_traj(true, pred)),
        "rel_l2_mean_step": float(step_err.mean()),
    }
    from position_induced_transformer_tpu.parallel.multihost import (
        is_main,
    )

    if plots_dir and is_main():
        from position_induced_transformer_tpu.train.plots import (
            save_benchmark_plots,
            save_step_error_plot,
        )

        # rel-L2 vs rollout step curve (reference:
        # tensorflow/4_Vorticity/evaluate.py:20-27) + prediction frames
        save_step_error_plot(step_err, plots_dir)
        save_benchmark_plots(problem, pred, plots_dir)
    if save_pred and is_main():
        from scipy.io import savemat

        savemat(save_pred, {"pred": pred, "true": true})
    return result


def _load_table(path: str):
    """Load a multi-variable input file as a dict, or None for .npy.

    .mat goes through the loaders' MATLAB reader (v5 directly; v7.3's
    column-major HDF5 layout is transposed back to MATLAB orientation).
    .h5/.hdf5 are read with h5py in NATIVE row-major layout — no
    transpose — so batches written by ordinary h5py code round-trip
    unchanged (only files following MATLAB's storage convention need the
    .mat suffix)."""
    if path.endswith(".mat"):
        from position_induced_transformer_tpu.data.loaders import load_mat

        return load_mat(path)
    if path.endswith((".h5", ".hdf5")):
        import h5py

        with h5py.File(path, "r") as f:
            return {k: np.array(f[k]) for k in f.keys()}
    return None


def _load_input(path: str, key: str = "x"):
    """Load a user-supplied input batch: ``(x, table)`` where ``table``
    is the full variable dict for .mat/.h5 (None for a bare .npy) — the
    file is parsed ONCE; key selects the input variable (see
    :func:`_load_table` for the layout conventions)."""
    if path.endswith(".npy"):
        return np.asarray(np.load(path)), None
    d = _load_table(path)
    if d is None:
        raise ValueError(
            f"unsupported input format {path!r} (expected .npy, .mat, .h5)"
        )
    if key not in d:
        raise KeyError(
            f"variable {key!r} not found in {path}; available: "
            f"{sorted(k for k in d if not k.startswith('__'))}"
        )
    return np.asarray(d[key]), d


def _prepare_inputs(problem, x: np.ndarray):
    """Validate/adapt a RAW user input batch to the benchmark's model
    input layout: apply the training x-normalization where the benchmark
    normalizes at data-preparation time (darcy family), and reshape
    grid <-> flattened layouts when the element counts agree."""
    import jax.numpy as jnp

    from position_induced_transformer_tpu.train.benchmarks import (
        host_setup_context,
    )

    x = np.asarray(x, np.float32)
    if problem.x_normalizer is not None:
        gs = tuple(problem.x_normalizer.mean.shape[1:])  # stats grid (h, w, C)
        if x.ndim - 1 == len(gs) and x.shape[-1] == gs[-1]:
            # grid-shaped input at ITS OWN resolution: the normalizer's
            # statistics bilinearly resize on apply (PixelWiseNormalizer
            # _stats_for), so ZSSR-resolution inference works — the
            # problem's grid may legitimately differ from the stats grid
            pass
        elif int(np.prod(x.shape[1:])) == int(np.prod(gs)):
            x = x.reshape((x.shape[0],) + gs)  # flattened training-res input
        else:
            raise ValueError(
                f"input sample shape {tuple(x.shape[1:])} is "
                f"incompatible: expected a grid-shaped batch "
                f"(..., h, w, {gs[-1]}) or a flattened batch of the "
                f"training resolution {gs}"
            )
        # normalize on the host backend: request prep must not make
        # eager accelerator round-trips (same rationale as Predictor's
        # host_setup_context startup)
        with host_setup_context():
            x = np.asarray(problem.x_normalizer.normalize(jnp.asarray(x)))
    expect = tuple(np.shape(problem.test_data["x"])[1:])
    if x.shape[1:] != expect:
        if int(np.prod(x.shape[1:])) != int(np.prod(expect)):
            raise ValueError(
                f"input sample shape {tuple(x.shape[1:])} does not match "
                f"the benchmark's model input {expect} (after "
                "normalization/reshape)"
            )
        x = x.reshape((x.shape[0],) + expect)
    # host numpy out: batch slicing stays on the host; the jitted forward
    # uploads each (possibly padded) batch itself
    return np.ascontiguousarray(x)


class _AccessRecorder(dict):
    """Batch-dict proxy recording which keys a geom_fn HARD-accesses.

    ``batch["mesh"]`` goes through the overridden ``__getitem__`` and is
    recorded; ``batch.get("thr_down")`` uses dict's C-level lookup and is
    not — exactly the required/optional split the benchmark setups encode
    (coordinates indexed directly, precomputed thresholds fetched with
    ``.get`` and recomputed in-op when absent)."""

    def __init__(self, base):
        super().__init__(base)
        self.hard = set()

    def __getitem__(self, k):
        self.hard.add(k)
        return super().__getitem__(k)


def _required_geometry_keys(problem) -> set:
    """Which extra batch variables the benchmark's per-sample geometry
    builder cannot do without. An explicit ``Task.geometry_required_keys``
    declaration wins; otherwise found by probing ``geom_fn`` on a small
    real batch (all extra-key access flows through geom_fn —
    Task.forward hands apply_fn ``{"x": x}`` only, train/loop.py). The
    probe relies on the geom_fn convention of ``batch[...]`` for
    required coordinates and ``.get`` for optionals — benchmarks that
    deviate must declare the explicit tuple."""
    if problem.task.geometry_required_keys is not None:
        return set(problem.task.geometry_required_keys)
    if problem.task.geom_fn is None:
        return set()
    probe = _AccessRecorder(
        {k: v[:1] for k, v in problem.test_data.items()}
    )
    problem.task.geom_fn(probe)
    return probe.hard - {"x", "y"}


def _prepare_infer_data(
    problem, x, table, input_path: str, input_key: str, required=None
):
    """Assemble the full inference batch dict for a benchmark.

    Fixed-mesh benchmarks need only ``x``. Per-sample-geometry benchmarks
    (elasticity, naca, elasticity_tf) rebuild geometry from extra batch
    variables each step: coordinate arrays (``mesh``/``mesh_in``/...)
    are REQUIRED from the input file under the same variable names, while
    the remaining extras (precomputed ``thr_*`` locality thresholds,
    plot-only coordinates) are optional — absent thresholds are computed
    in-op with identical semantics (the setup-time hoist is a throughput
    optimization, PiTTFPointCloud.__call__ /
    ops/locality.batched_topk_thresholds). ``table`` is the already
    parsed variable dict from :func:`_load_input` (None for .npy)."""
    data = {"x": _prepare_inputs(problem, x)}
    n = int(data["x"].shape[0])
    extra = [k for k in problem.test_data if k not in ("x", "y")]
    if not extra:
        return data
    if required is None:
        required = _required_geometry_keys(problem)
    if table is None and required:
        raise ValueError(
            f"benchmark {problem.config.name!r} builds per-sample geometry "
            f"from extra batch variables {sorted(required)}; provide a "
            f".mat/.h5 input containing them alongside {input_key!r} (a "
            "bare .npy carries only one array)"
        )
    for k in extra:
        if table is None or k not in table:
            if k in required:
                raise ValueError(
                    f"input file {input_path} is missing required variable "
                    f"{k!r} (benchmark {problem.config.name!r} batch "
                    f"layout: {['x'] + extra})"
                )
            continue  # optional thr_*: exact in-op fallback
        arr = np.asarray(table[k], np.float32)
        expect = (n,) + tuple(np.shape(problem.test_data[k])[1:])
        if arr.shape != expect:
            raise ValueError(
                f"input variable {k!r} has shape {tuple(arr.shape)}, "
                f"expected {expect}"
            )
        data[k] = arr  # host numpy; the jitted forward uploads per batch
    return data


class Predictor:
    """A restored checkpoint held WARM for repeated inference calls.

    Loads the checkpoint and builds the benchmark problem once, then
    keeps persistent jitted callables — repeated ``predict_*`` calls at
    the same batch shape reuse the compiled executable instead of
    re-tracing per call (the property a serving process needs;
    :func:`infer` wraps one of these for the one-shot CLI flow).

    ``mesh``: 'auto' | 'data=N[,model=M]' | 'dcn=K,...' shards inference
    batches data-parallel; 'stage=K' runs the forward GPipe
    pipeline-parallel (torch-family fixed meshes).
    """

    def __init__(
        self,
        config,
        checkpoint_path: str,
        data_path: Optional[str] = None,
        setup_kwargs: Optional[dict] = None,
        mesh=None,
        model_variant: Optional[str] = None,
    ):
        import jax

        cfg = get(config) if isinstance(config, str) else config
        if model_variant:
            cfg = dataclasses.replace(cfg, model_variant=model_variant)
        restored = ckpt.restore(checkpoint_path)
        params = restored["params"] if "params" in restored else restored
        setup_kwargs = _checkpoint_normalizers(
            cfg, restored, dict(setup_kwargs or {})
        )
        # geometry + task only — keep the (synthetic) data split minimal.
        # Exception: a normalizing benchmark's checkpoint WITHOUT stored
        # statistics (e.g. one imported from a reference torch .pth via
        # the convert CLI) must refit them on the FULL training split —
        # fitting on the minimal split would silently denormalize with
        # garbage statistics (evaluate() follows the same convention).
        # Setup math runs on the host CPU backend (zero accelerator
        # round-trips — on a degraded relay each eager device op costs
        # seconds to minutes); the finished arrays upload in one batched
        # device_put (benchmarks.commit_problem) or, with a mesh, via
        # replicate_tree below.
        nmin = max(2, min(cfg.batch_size, 8))
        ntrain = nmin
        if (
            _setup_accepts_normalizers(cfg)
            and "normalizers" not in setup_kwargs
        ):
            ntrain = None  # full split — stats must match training
        with benchmarks.host_setup_context():
            problem = benchmarks.setup(
                cfg, data_path, ntrain=ntrain, ntest=nmin, **setup_kwargs
            )
            # probe the per-sample geometry builder NOW, while the test
            # split is host-resident — after commit_problem the probe's
            # eager ops would dispatch op-by-op on the accelerator
            # (seconds to minutes on a degraded relay)
            required_keys = frozenset(_required_geometry_keys(problem))
        state = TrainState(params, None, 0)
        # the training split's job is done (normalizer refit inside
        # setup); don't upload/pin it on device for the serving lifetime
        problem.train_data = {}

        from position_induced_transformer_tpu.parallel.sharding import (
            parse_mesh_spec,
            replicate_tree,
        )

        mesh = parse_mesh_spec(mesh)
        if mesh is not None and "stage" in mesh.shape:
            from position_induced_transformer_tpu.parallel.pipeline import (
                enable_pipeline,
            )

            # pass the serving batch size so the schedule gets K
            # microbatches (n_micro=1 would run the stages strictly
            # sequentially, idling K-1 devices per request);
            # _batch_size rounds every request batch to a multiple
            state, _ = enable_pipeline(
                problem, state, mesh,
                batch_size=cfg.eval_batch_size or cfg.batch_size,
            )  # also replicates geom + data splits over the stage mesh
            mesh = None
        elif mesh is not None:
            # jit arguments must share a placement: params, geometry and
            # the warmup/test data all replicate over the SAME mesh
            # (a single-device commit_problem here would crash the first
            # forward with mixed committed devices on TPU)
            state = TrainState(replicate_tree(mesh, state.params), None, 0)
            if problem.geom is not None:
                problem.geom = replicate_tree(mesh, problem.geom)
            problem.train_data = replicate_tree(mesh, problem.train_data)
            problem.test_data = replicate_tree(mesh, problem.test_data)
        else:
            problem = benchmarks.commit_problem(problem)

        self.cfg = cfg
        self.problem = problem
        self.state = state
        self.mesh = mesh
        # constant per benchmark — probed once (host-side, above), reused
        # on every request
        self.required_keys = required_keys
        task = problem.task
        if mesh is not None:
            from position_induced_transformer_tpu.parallel.sharding import (
                shard_batch,
            )

            self._fwd = jax.jit(
                lambda p, g, b: task.forward(p, g, shard_batch(mesh, b))
            )
            self._rollout = jax.jit(
                lambda p, g, x, steps: task.rollout(
                    p, g, shard_batch(mesh, {"x": x})["x"], steps
                ),
                static_argnums=3,
            )
        else:
            self._fwd = jax.jit(task.forward)
            self._rollout = jax.jit(task.rollout, static_argnums=3)

    def _batch_size(self, batch_size: Optional[int]) -> int:
        # independent of the request size — small requests pad UP to the
        # serving batch size
        # (padded_batches repeats the tail index) so every request reuses
        # the one warmed executable — a fresh XLA compile per distinct
        # request size would stall seconds-to-minutes through a degraded
        # TPU relay (serve.py warms exactly this shape at startup)
        from position_induced_transformer_tpu.train.runner import round_batch

        if batch_size is not None and batch_size < 1:
            raise ValueError(f"batch_size must be >= 1, got {batch_size}")
        bs = batch_size or self.cfg.eval_batch_size or self.cfg.batch_size
        # pipeline-parallel forward: every padded batch must split into
        # the GPipe schedule's microbatches
        bs = round_batch(bs, getattr(self.problem.task, "pp_micro", 0) or 1)
        if self.mesh is not None:
            from position_induced_transformer_tpu.parallel.sharding import (
                data_axis_size,
            )

            bs = round_batch(bs, data_axis_size(self.mesh))
        return bs

    def predict_array(
        self,
        data: dict,
        rollout_steps: int = 0,
        batch_size: Optional[int] = None,
    ) -> np.ndarray:
        """Predictions over a prepared batch dict (padded-tail batching —
        every sample covered, one compiled shape per batch size)."""
        import jax

        from position_induced_transformer_tpu.train.runner import (
            padded_batches,
        )

        n = data["x"].shape[0]
        bs = self._batch_size(batch_size)
        params, geom = self.state.params, self.problem.geom
        outs = []
        for idx in padded_batches(n, bs):
            batch = jax.tree_util.tree_map(lambda a: a[idx], data)
            if rollout_steps:
                out = self._rollout(params, geom, batch["x"], rollout_steps)
            else:
                out = self._fwd(params, geom, batch)
            outs.append(np.asarray(out))
        return np.concatenate(outs, axis=0)[:n]

    def prepare_file(self, input_path: str, input_key: str = "x") -> dict:
        """Parse + validate a user input file into the batch dict
        ``predict_array`` takes (the load half of :meth:`predict_file`,
        split out so a serving layer can coalesce prepared batches)."""
        x_raw, table = _load_input(input_path, input_key)
        if x_raw.ndim < 2:
            raise ValueError(
                f"input must carry a leading batch axis; got shape "
                f"{tuple(x_raw.shape)}"
            )
        if x_raw.shape[0] < 1:
            raise ValueError("input batch is empty (0 samples)")
        return _prepare_infer_data(
            self.problem, x_raw, table, input_path, input_key,
            required=self.required_keys,
        )

    def predict_file(
        self,
        input_path: str,
        input_key: str = "x",
        rollout_steps: Optional[int] = None,
        batch_size: Optional[int] = None,
    ) -> np.ndarray:
        """Predictions for a user-supplied .npy/.mat/.h5 input batch
        (RAW physical values; see :func:`infer` for the conventions)."""
        data = self.prepare_file(input_path, input_key)
        steps = (
            self.cfg.rollout_steps if rollout_steps is None else rollout_steps
        )
        return self.predict_array(data, steps, batch_size)


def infer(
    config: str,
    checkpoint_path: str,
    input_path: str,
    input_key: str = "x",
    output_path: Optional[str] = None,
    batch_size: Optional[int] = None,
    rollout_steps: Optional[int] = None,
    data_path: Optional[str] = None,
    setup_kwargs: Optional[dict] = None,
    mesh=None,
    model_variant: Optional[str] = None,
) -> dict:
    """Deployment-style inference: a restored checkpoint applied to a
    user-supplied input batch — no test split required.

    The reference has no such entry point: its eval scripts hard-code the
    benchmark test set (e.g. tensorflow/5_Elasticity/evaluate.py
    ``model.predict(testX)``); this accepts any .npy/.mat batch laid out
    like the benchmark's inputs. Inputs are RAW physical values —
    benchmarks that normalize inputs at data-preparation time (darcy
    family) apply the checkpoint's training statistics here, and outputs
    are post-processed exactly like evaluate/predict (in-call
    denormalization where the benchmark denormalizes).

    ``rollout_steps``: for autoregressive benchmarks, how many steps to
    roll forward from each input state (default: the benchmark's
    configured horizon). ``mesh``: see :class:`Predictor`. For a
    long-lived process serving many requests, hold a :class:`Predictor`
    (or run the ``serve`` CLI) instead of calling this per batch.
    """
    if output_path and not output_path.endswith((".npy", ".mat")):
        # pure string check: fail BEFORE the compile + full device run,
        # not after (a typo'd extension used to discard the predictions)
        raise ValueError(
            f"unsupported output format {output_path!r} "
            "(expected .npy or .mat)"
        )
    predictor = Predictor(
        config, checkpoint_path, data_path=data_path,
        setup_kwargs=setup_kwargs, mesh=mesh, model_variant=model_variant,
    )
    cfg = predictor.cfg
    steps = cfg.rollout_steps if rollout_steps is None else rollout_steps
    pred = predictor.predict_file(
        input_path, input_key, rollout_steps=steps, batch_size=batch_size
    )

    from position_induced_transformer_tpu.parallel.multihost import is_main

    if output_path and is_main():
        if output_path.endswith(".npy"):
            np.save(output_path, pred)
        elif output_path.endswith(".mat"):
            from scipy.io import savemat

            savemat(output_path, {"pred": pred})
        else:
            raise ValueError(
                f"unsupported output format {output_path!r} "
                "(expected .npy or .mat)"
            )
    return {
        "benchmark": cfg.name,
        "n": int(pred.shape[0]),
        "pred_shape": [int(s) for s in pred.shape],
        "rollout_steps": int(steps),
        "output": output_path,
    }
