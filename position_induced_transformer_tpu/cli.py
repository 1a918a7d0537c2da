"""Command-line interface.

Replaces the reference's seven argument-less driver scripts with one entry
point (SURVEY.md §1 L4 "experiment drivers"):

    python -m position_induced_transformer_tpu train --benchmark burgers
    python -m position_induced_transformer_tpu evaluate --benchmark darcy \
        --checkpoint ckpt/ --zssr
    python -m position_induced_transformer_tpu benchmarks

Data defaults to the synthetic generators; pass --data-path to use the real
datasets (reference: README.md:17-22 download links).
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_common(p):
    p.add_argument("--benchmark", required=True, help="benchmark name")
    p.add_argument("--data-path", default=None, help="dataset file/dir")
    p.add_argument("--ntrain", type=int, default=None)
    p.add_argument("--ntest", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument(
        "--platform", default=None,
        help="force a jax platform (e.g. 'cpu'); default = environment's "
        "backend (TPU when available)",
    )
    p.add_argument(
        "--model-variant", default=None,
        choices=["pit", "lite", "transformer", "selfpit"],
        help="ablation model for TF-family benchmarks (reference swaps one "
        "constructor line per driver, tensorflow/*/train.py): 'lite' = "
        "self-attention processor, 'transformer' = all self-attention, "
        "'selfpit' = hybrid dot-product + distance-bias attention",
    )
    p.add_argument(
        "--mesh", default=None,
        help="device mesh for multi-chip execution: 'auto' (all visible "
        "devices data-parallel), 'data=N[,model=M]' (N-way data x M-way "
        "tensor parallelism over ICI), optionally 'dcn=K,data=N[,model=M]' "
        "(K-slice outer data parallelism whose gradient all-reduce crosses "
        "DCN), or 'stage=K' (GPipe pipeline "
        "parallelism over the processor blocks; torch-family fixed-mesh "
        "benchmarks). train: batch sharded over 'data', params/Adam "
        "moments over 'model'. evaluate: data-parallel batches; with "
        "--zssr the 421^2 decoder query rows are sequence-sharded instead",
    )
    p.add_argument(
        "--set", action="append", default=None, metavar="KEY=VALUE",
        dest="overrides",
        help="override any config field, repeatable (the reference "
        "hard-codes hyperparameters as module constants): e.g. "
        "--set model.hid_dim=128 --set lr=3e-4 --set latent_grid=16,16",
    )
    p.add_argument(
        "--multihost", default=None,
        help="join a multi-process JAX cluster before anything else: "
        "'auto' (TPU pod metadata autodetect — the standard one-process-"
        "per-host launch) or 'coordinator=HOST:PORT,num_processes=N,"
        "process_id=I'. Every host runs the SAME command; --mesh then "
        "spans the global device list and stdout/artifacts are written "
        "by process 0 (parallel/multihost.py)",
    )
    _add_problem_module(p)
    p.add_argument(
        "--fused-mode", default=None, choices=["auto", "always", "never"],
        help="Pallas kernel dispatch (sets PIT_FUSED_MODE): 'auto' = "
        "measured policy (batched kernels for per-sample meshes, XLA for "
        "fixed meshes), 'always' forces the fixed-mesh streaming kernel, "
        "'never' disables all fused kernels",
    )


def _add_problem_module(p):
    p.add_argument(
        "--problem-module", action="append", default=None, metavar="MODULE",
        dest="problem_modules",
        help="import this python module (or .py file path) before resolving "
        "the benchmark name; the module registers user-defined benchmarks "
        "via position_induced_transformer_tpu.register_benchmark (see "
        "examples/custom_problem.py). Repeatable",
    )


def _load_problem_modules(args):
    """Import user modules that register custom benchmarks.

    Accepts dotted module names (``examples.custom_problem``) or direct
    ``.py`` file paths; either way the import side effect is the
    registration. Runs before any benchmark-name lookup so user problems
    work with every subcommand."""
    import importlib
    import importlib.util
    import os

    for mod in getattr(args, "problem_modules", None) or ():
        if mod.endswith(".py") or os.path.sep in mod:
            path = os.path.abspath(mod)
            # collision-safe module name: the bare basename could shadow a
            # stdlib/third-party module for the rest of the process
            name = "_pit_problem_" + os.path.splitext(os.path.basename(path))[0]
            spec = importlib.util.spec_from_file_location(name, path)
            if spec is None or spec.loader is None:
                raise ValueError(f"cannot import problem module {mod!r}")
            module = importlib.util.module_from_spec(spec)
            sys.modules[name] = module
            try:
                spec.loader.exec_module(module)
            except BaseException:
                sys.modules.pop(name, None)  # don't cache a broken module
                raise
        elif mod in sys.modules:
            # registration is an import side effect; re-execute so a second
            # cli.main() call in the same process re-registers (parity with
            # the .py-path form, which always executes)
            importlib.reload(sys.modules[mod])
        else:
            importlib.import_module(mod)


def _apply_platform(args):
    import os

    import jax

    platform = getattr(args, "platform", None)
    if platform:
        jax.config.update("jax_platforms", platform)
    multihost = getattr(args, "multihost", None)
    if multihost:
        from position_induced_transformer_tpu.parallel import (
            multihost as mh,
        )

        mh.initialize(multihost)  # before any backend/array use
    fused = getattr(args, "fused_mode", None)
    if fused:
        os.environ["PIT_FUSED_MODE"] = fused
    # persistent XLA compile cache: TPU compiles are expensive (remote
    # compile through a relay can take minutes), so every CLI entry point
    # reuses compiled executables across processes/restarts. Respects an
    # existing JAX_COMPILATION_CACHE_DIR / prior jax.config setting;
    # override the default location with PIT_JAX_CACHE.
    if not jax.config.jax_compilation_cache_dir:
        # a source checkout's warm cache (scripts/bench.py use it) beats
        # starting a second cache under ~/.cache
        repo_cache = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
        default = (
            repo_cache
            if os.path.isdir(repo_cache)
            else os.path.join(os.path.expanduser("~"), ".cache", "pit-jax")
        )
        cache = os.environ.get("PIT_JAX_CACHE", default)
        jax.config.update("jax_compilation_cache_dir", cache)


def _convert(args):
    """Checkpoint interop with the reference: import its ``model.pth``
    state dicts (train_burgers.py:116) into our checkpoint format, or
    export ours back for loading with ``model.load_state_dict`` —
    torch-family PiT models (the name mapping lives in
    utils/torch_compat.py)."""
    from position_induced_transformer_tpu.train import checkpoint as ckpt
    from position_induced_transformer_tpu.utils import torch_compat

    def validate(params):
        if not args.benchmark:
            return
        import jax

        from position_induced_transformer_tpu.configs import get as get_cfg
        from position_induced_transformer_tpu.train import benchmarks, runner
        from position_induced_transformer_tpu.train.loop import make_optimizer

        cfg = get_cfg(args.benchmark)
        problem = benchmarks.setup(
            cfg, None,
            ntrain=min(cfg.ntrain, 2 * cfg.batch_size),
            ntest=min(cfg.ntest, cfg.batch_size),
        )
        expect = runner.init_state(problem, make_optimizer(cfg.lr, 1)).params
        want = {
            (p, tuple(v.shape))
            for p, v in jax.tree_util.tree_leaves_with_path(expect)
        }
        got = {
            (p, tuple(v.shape))
            for p, v in jax.tree_util.tree_leaves_with_path(params)
        }
        if want != got:
            missing = sorted(str(p) for p, _ in want - got)
            extra = sorted(str(p) for p, _ in got - want)
            raise ValueError(
                f"converted parameters do not match benchmark "
                f"{args.benchmark!r}: missing {missing or 'none'}, "
                f"unexpected/mis-shaped {extra or 'none'}"
            )

    if args.from_torch and args.dst:
        state = torch_compat.load_torch_checkpoint(args.from_torch)
        params = torch_compat.torch_state_dict_to_flax(state)
        validate(params)
        out = ckpt.save(args.dst, {"params": params})
        print(json.dumps({"imported": args.from_torch, "checkpoint": out}))
        return 0
    if args.src and args.to_torch:
        restored = ckpt.restore(args.src)
        params = restored["params"] if "params" in restored else restored
        validate(params)
        state = torch_compat.flax_params_to_torch_state_dict(params)
        torch_compat.save_torch_checkpoint(args.to_torch, state)
        print(json.dumps({"exported": args.to_torch, "n_tensors": len(state)}))
        return 0
    raise ValueError(
        "convert needs either --from-torch + --to (import) or "
        "--from + --to-torch (export)"
    )


def _resolve_data_path(args):
    """Real-data resolution (data/catalog.py canonical layout):

    - an explicit ``--data-path`` pointing at a catalog-layout ROOT
      resolves to the benchmark's file/dir inside it; any other explicit
      path is passed through unchanged (single-file / custom layouts);
    - with no ``--data-path``, a set ``PIT_REAL_DATA_DIR`` whose layout
      carries this benchmark's files switches the run onto the real
      dataset automatically — the one-command real-data path
      (scripts/fetch_data.py downloads/verifies the layout);
    - otherwise None (synthetic fallback, with the loaders' warning).
    """
    import os
    import sys as _sys

    from position_induced_transformer_tpu.data import catalog

    bench = getattr(args, "benchmark", None)
    dp = getattr(args, "data_path", None)
    if dp is not None:
        if bench and os.path.isdir(dp):
            resolved = catalog.data_path_for(bench, dp)
            if resolved is not None and resolved != dp:
                return resolved
        return dp
    root = catalog.real_data_root()
    if bench and root:
        resolved = catalog.data_path_for(bench, root)
        if resolved is not None:
            print(
                f"[data] PIT_REAL_DATA_DIR: using real {bench} dataset "
                f"({resolved})",
                file=_sys.stderr,
            )
            return resolved
    return None


def main(argv=None):
    parser = argparse.ArgumentParser(prog="position_induced_transformer_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="train a benchmark")
    _add_common(p_train)
    p_train.add_argument("--epochs", type=int, default=None)
    p_train.add_argument("--checkpoint", default=None, help="save path")
    p_train.add_argument("--log", default=None, help="JSONL metrics path")
    p_train.add_argument(
        "--save-pred", default=None, help="save test predictions (.mat)"
    )
    p_train.add_argument(
        "--profile", default=None, help="capture a jax.profiler trace dir"
    )
    p_train.add_argument(
        "--history-csv", default=None, help="write training history CSV"
    )
    p_train.add_argument(
        "--history-plot", default=None, help="write log-scale history PNG"
    )
    p_train.add_argument(
        "--debug-nans", action="store_true",
        help="abort on the first NaN under jit (numerics sanitizer)",
    )
    p_train.add_argument(
        "--plots", default=None, help="write prediction figures to this dir"
    )
    p_train.add_argument(
        "--resume", default=None,
        help="resume training from a checkpoint (params + optimizer + step)",
    )
    p_train.add_argument(
        "--checkpoint-every", type=int, default=None,
        help="also write the checkpoint every N epochs (mid-run recovery)",
    )
    p_train.add_argument(
        "--grad-accum", type=int, default=1,
        help="accumulate gradients over N sequential microbatches per "
        "optimizer step (identical optimization trajectory at ~1/N the "
        "peak activation memory; the benchmark batch size must divide "
        "evenly)",
    )
    p_train.add_argument(
        "--sync-every", type=int, default=1,
        help="read metrics back from the device every N epochs (0 = only "
        "at the end); deferring the host sync keeps the device pipeline "
        "full when readback latency is high",
    )

    p_eval = sub.add_parser("evaluate", help="evaluate a checkpoint")
    _add_common(p_eval)
    p_eval.add_argument("--checkpoint", required=True)
    p_eval.add_argument(
        "--zssr", action="store_true",
        help="Darcy zero-shot super-resolution at full 421^2 resolution",
    )
    p_eval.add_argument(
        "--zssr-downsampling", type=int, default=1,
        help="downsampling factor for the ZSSR evaluation mesh "
        "(1 = full 421^2; larger = intermediate super-resolution)",
    )
    p_eval.add_argument("--save-pred", default=None)
    p_eval.add_argument(
        "--plots", default=None, help="write prediction figures to this dir"
    )
    p_eval.add_argument(
        "--shuffle-ablation", action="store_true",
        help="also report test rel-L2 with the input functions shuffled "
        "across samples (operator-learning probe: a model whose error "
        "does not inflate is ignoring the input function)",
    )

    p_inf = sub.add_parser(
        "infer",
        help="run a checkpoint on user-supplied inputs (deployment "
        "inference; no test split needed)",
    )
    _add_common(p_inf)
    p_inf.add_argument("--checkpoint", required=True)
    p_inf.add_argument(
        "--input", required=True,
        help="input batch file (.npy, or .mat/.h5 with --input-key); RAW "
        "physical values laid out like the benchmark's inputs (grid or "
        "flattened) — normalization/denormalization is applied internally",
    )
    p_inf.add_argument(
        "--input-key", default="x",
        help="variable name inside a .mat/.h5 input file (default 'x')",
    )
    p_inf.add_argument(
        "--output", default=None,
        help="write predictions to this path (.npy or .mat)",
    )
    p_inf.add_argument("--batch-size", type=int, default=None)
    p_inf.add_argument(
        "--rollout-steps", type=int, default=None,
        help="autoregressive rollout horizon (default: the benchmark's "
        "configured horizon; 0 disables rollout)",
    )
    p_inf.add_argument(
        "--zssr-downsampling", type=int, default=None,
        help="run inference at another mesh resolution (benchmarks whose "
        "setup declares 'downsampling', e.g. darcy: 1 = full 421^2); the "
        "input batch must be grid-shaped at that resolution — training "
        "normalizer statistics resize internally (ZSSR deployment)",
    )

    p_srv = sub.add_parser(
        "serve",
        help="serve a checkpoint over HTTP (warm compiled model; "
        "POST /predict with a .npy/.mat/.h5 body, GET /health, GET /info)",
    )
    _add_common(p_srv)
    p_srv.add_argument("--checkpoint", required=True)
    p_srv.add_argument("--host", default="127.0.0.1")
    p_srv.add_argument("--port", type=int, default=8765)
    p_srv.add_argument(
        "--no-warmup", action="store_true",
        help="skip the startup compile at the serving batch size (first "
        "request then pays XLA compilation)",
    )

    p_conv = sub.add_parser(
        "convert",
        help="convert checkpoints to/from the reference's torch .pth "
        "format (torch-family PiT models)",
    )
    p_conv.add_argument(
        "--benchmark", default=None,
        help="validate the converted parameter structure against this "
        "benchmark's model (recommended)",
    )
    p_conv.add_argument(
        "--from-torch", default=None,
        help="reference model.pth to import ({'model_state': ...} or a "
        "bare state dict)",
    )
    p_conv.add_argument(
        "--to-torch", default=None,
        help="write a reference-compatible model.pth here",
    )
    p_conv.add_argument(
        "--from", dest="src", default=None, help="our checkpoint to export"
    )
    p_conv.add_argument(
        "--to", dest="dst", default=None,
        help="write the imported checkpoint here",
    )
    _add_problem_module(p_conv)
    p_conv.add_argument(
        "--platform", default=None,
        help="force a jax platform (validation builds the benchmark model)",
    )

    p_bench = sub.add_parser("benchmarks", help="list available benchmarks")
    _add_problem_module(p_bench)
    p_bench.add_argument(
        "--platform", default=None,
        help="force a jax platform before importing problem modules "
        "(a user module touching jax at import time would otherwise "
        "initialize the default backend)",
    )

    p_desc = sub.add_parser(
        "describe", help="print a model/problem summary for a benchmark"
    )
    _add_common(p_desc)

    args = parser.parse_args(argv)
    if getattr(args, "data_path", None) is not None or getattr(
        args, "benchmark", None
    ):
        args.data_path = _resolve_data_path(args)

    if args.command == "convert":
        _apply_platform(args)
        _load_problem_modules(args)
        return _convert(args)

    if args.command == "benchmarks":
        _apply_platform(args)
        _load_problem_modules(args)
        from position_induced_transformer_tpu.configs import REGISTRY

        for name, cfg in sorted(REGISTRY.items()):
            m = cfg.model
            print(
                f"{name:12s} hid={m.hid_dim:<4d} heads={m.n_head} "
                f"blocks={m.n_blocks} metric={cfg.metric:10s} "
                f"epochs={cfg.epochs}"
            )
        return 0

    _apply_platform(args)  # platform is pinned before user modules import jax
    _load_problem_modules(args)
    from position_induced_transformer_tpu.train import runner

    # --set overrides resolve the name to a config object once; every
    # entry point below accepts either form
    if getattr(args, "overrides", None):
        from position_induced_transformer_tpu.configs import (
            apply_overrides,
            get as _get_cfg,
        )

        args.benchmark = apply_overrides(
            _get_cfg(args.benchmark), args.overrides
        )

    if args.command == "describe":
        import jax

        from position_induced_transformer_tpu.train import benchmarks
        from position_induced_transformer_tpu.train.loop import make_optimizer
        from position_induced_transformer_tpu.configs import get as get_cfg
        from position_induced_transformer_tpu.utils import count_params

        cfg = (
            args.benchmark
            if not isinstance(args.benchmark, str)
            else get_cfg(args.benchmark)
        )
        if args.model_variant:
            import dataclasses

            cfg = dataclasses.replace(cfg, model_variant=args.model_variant)
        problem = benchmarks.setup(
            cfg, args.data_path,
            ntrain=args.ntrain or min(cfg.ntrain, 4 * cfg.batch_size),
            ntest=args.ntest or min(cfg.ntest, cfg.batch_size),
        )
        state = runner.init_state(problem, make_optimizer(cfg.lr, 1))
        info = {
            "benchmark": cfg.name,
            "model": type(problem.model).__name__,
            "params": count_params(state.params),
            "metric": cfg.metric,
            "loss": f"rel-L{cfg.loss_p}",
            "rollout_steps": cfg.rollout_steps,
            "train_shape": {
                k: list(v.shape) for k, v in problem.train_data.items()
            },
        }
        print(json.dumps(info, indent=1))
        return 0

    if args.command == "train":
        if args.debug_nans:
            from position_induced_transformer_tpu.utils.profiling import (
                debug_nans,
            )

            debug_nans(True)
        problem, state, history = runner.train(
            args.benchmark,
            data_path=args.data_path,
            epochs=args.epochs,
            ntrain=args.ntrain,
            ntest=args.ntest,
            seed=args.seed,
            log_path=args.log,
            checkpoint_path=args.checkpoint,
            profile_dir=args.profile,
            history_csv=args.history_csv,
            history_plot=args.history_plot,
            resume_from=args.resume,
            checkpoint_every=args.checkpoint_every,
            sync_every=args.sync_every,
            mesh=args.mesh,
            model_variant=args.model_variant,
            grad_accum=args.grad_accum,
        )
        from position_induced_transformer_tpu.parallel.multihost import (
            is_main,
        )

        final = history[-1] if history else {}
        if is_main():
            print(json.dumps({"final": final}))
        if args.save_pred or args.plots:
            from scipy.io import savemat
            import numpy as np

            # predict runs on EVERY process (test_data may be globally
            # replicated arrays after a --multihost --mesh run; the
            # computation itself has no cross-process collectives) —
            # only the artifact writes gate to process 0
            pred = runner.predict(problem, state)
            if args.save_pred and is_main():
                savemat(
                    args.save_pred,
                    {
                        "pred": pred,
                        "trueX": np.asarray(problem.test_data["x"]),
                        "trueY": np.asarray(problem.test_data["y"]),
                    },
                )
            if args.plots and is_main():
                from position_induced_transformer_tpu.train.plots import (
                    save_benchmark_plots,
                )

                save_benchmark_plots(problem, pred, args.plots)
        return 0

    if args.command == "infer":
        from position_induced_transformer_tpu.train import evaluate

        setup_kwargs = None
        if args.zssr_downsampling is not None:
            setup_kwargs = {"downsampling": args.zssr_downsampling}
        result = evaluate.infer(
            args.benchmark,
            checkpoint_path=args.checkpoint,
            input_path=args.input,
            input_key=args.input_key,
            output_path=args.output,
            batch_size=args.batch_size,
            rollout_steps=args.rollout_steps,
            data_path=args.data_path,
            mesh=args.mesh,
            model_variant=args.model_variant,
            setup_kwargs=setup_kwargs,
        )
        print(json.dumps(result))
        return 0

    if args.command == "serve":
        from position_induced_transformer_tpu.train.serve import serve

        serve(
            args.benchmark,
            checkpoint_path=args.checkpoint,
            host=args.host,
            port=args.port,
            warmup=not args.no_warmup,
            data_path=args.data_path,
            mesh=args.mesh,
            model_variant=args.model_variant,
        )
        return 0

    if args.command == "evaluate":
        from position_induced_transformer_tpu.train import evaluate

        result = evaluate.evaluate(
            args.benchmark,
            checkpoint_path=args.checkpoint,
            data_path=args.data_path,
            ntest=args.ntest,
            zssr=args.zssr,
            zssr_downsampling=args.zssr_downsampling,
            save_pred=args.save_pred,
            plots_dir=args.plots,
            mesh=args.mesh,
            model_variant=args.model_variant,
            shuffle_ablation=args.shuffle_ablation,
        )
        from position_induced_transformer_tpu.parallel.multihost import (
            is_main,
        )

        if is_main():
            print(json.dumps(result))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
