"""A user-defined PDE benchmark registered through the public API.

The reference implementation has no extension point: each of its seven
experiments is a hand-written driver script (e.g.
/root/reference/train_burgers.py), so adding a PDE means copying one and
editing it. This framework instead exposes
``position_induced_transformer_tpu.register_benchmark(cfg, setup_fn)``:
after registration the new problem is a first-class benchmark in every
entry point — ``runner.train``, the train/evaluate/infer/serve CLIs,
``--set`` hyperparameter overrides and ``--mesh`` parallelism.

The PDE here is 1-D periodic advection-diffusion,

    u_t + c u_x = nu u_xx,    x in [0, 1),  u(x, 0) = u0(x),

whose solution operator is exact in Fourier space:
``u_hat_k(T) = u_hat_k(0) * exp(-nu (2 pi k)^2 T - i c (2 pi k) T)`` —
so the training targets are the true operator, not a surrogate. The model
learns the operator u0 -> u(., T).

Run directly (trains a short demonstration budget on any backend):

    python examples/custom_problem.py [--epochs N] [--platform cpu]

or use it from the CLI like any built-in benchmark:

    python -m position_induced_transformer_tpu describe \
        --benchmark advection --problem-module examples/custom_problem.py
    python -m position_induced_transformer_tpu train \
        --benchmark advection --problem-module examples/custom_problem.py \
        --epochs 20 --set model.hid_dim=64 --mesh data=2
"""

from __future__ import annotations

import os
import sys

import numpy as np

# runnable from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import position_induced_transformer_tpu as pit
from position_induced_transformer_tpu.configs import BenchmarkConfig, ModelConfig
from position_induced_transformer_tpu.data import meshes
from position_induced_transformer_tpu.data.synthetic import _fourier_series_1d
from position_induced_transformer_tpu.models import build_geometry_host
from position_induced_transformer_tpu.train.benchmarks import Problem
from position_induced_transformer_tpu.train.loop import Task

# --- 1. the configuration: same dataclass the built-in benchmarks use ----

ADVECTION = BenchmarkConfig(
    name="advection",
    model=ModelConfig(
        space_dim=1, in_dim=1, out_dim=1, hid_dim=32, n_head=2, n_blocks=3,
        en_loc=0.02, de_loc=0.02,
    ),
    metric="periodic1d",
    ntrain=512, ntest=128, batch_size=8, epochs=100, loss_p=2,
    grid=(256,), latent_grid=(64,), periodic_grid=True,
)

# physics of the demonstration operator
SPEED = 0.5       # advection speed c
VISCOSITY = 2e-3  # diffusivity nu
HORIZON = 0.5     # solution time T


def advection_diffusion_exact(u0: np.ndarray, c: float, nu: float,
                              t: float) -> np.ndarray:
    """Exact periodic advection-diffusion solution operator, (n, L)->(n, L)."""
    L = u0.shape[-1]
    k = 2.0 * np.pi * np.fft.rfftfreq(L, d=1.0 / L)  # wavenumbers on [0,1)
    decay = np.exp((-nu * k**2 - 1j * c * k) * t)
    return np.fft.irfft(np.fft.rfft(u0, axis=-1) * decay, n=L, axis=-1)


def make_data(n: int, L: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    u0 = _fourier_series_1d(rng, n, L)
    y = advection_diffusion_exact(u0, SPEED, VISCOSITY, HORIZON)
    return u0[..., None].astype(np.float32), y[..., None].astype(np.float32)


# --- 2. the setup function: data -> Geometry -> Task -> Problem ----------

def setup_advection(cfg, data_path=None, ntrain=None, ntest=None) -> Problem:
    """Same contract as the built-in ``setup_*`` functions
    (train/benchmarks.py): returns a Problem the unified runner consumes.
    ``data_path`` could load a user dataset; the demo generates the exact
    solution on the fly."""
    import jax.numpy as jnp

    ntrain, ntest = ntrain or cfg.ntrain, ntest or cfg.ntest
    L = cfg.grid[0]
    x_all, y_all = make_data(ntrain + ntest, L, seed=cfg.seed)
    x_tr, y_tr = x_all[:ntrain], y_all[:ntrain]
    x_te, y_te = x_all[ntrain:], y_all[ntrain:]

    mesh = jnp.asarray(meshes.grid_1d(L))
    mesh_ltt = jnp.asarray(meshes.grid_1d(cfg.latent_grid[0]))
    geom = build_geometry_host(
        mesh, mesh_ltt, mesh, metric=cfg.metric,
        en_loc=cfg.model.en_loc, de_loc=cfg.model.de_loc,
    )
    from position_induced_transformer_tpu.train.benchmarks import _make_model

    model = _make_model(cfg)
    task = Task(model=model, loss_p=cfg.loss_p, out_dim=cfg.model.out_dim)
    return Problem(
        cfg, model, task, geom,
        {"x": jnp.asarray(x_tr), "y": jnp.asarray(y_tr)},
        {"x": jnp.asarray(x_te), "y": jnp.asarray(y_te)},
        ntrain, ntest,
    )


# --- 3. registration: importing this module is enough --------------------

pit.register_benchmark(ADVECTION, setup_advection, overwrite=True)


def main(argv=None):
    import argparse
    import json

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--platform", default=None, help="e.g. 'cpu'")
    ap.add_argument(
        "--zssr-factor", type=int, default=2,
        help="also evaluate zero-shot at this multiple of the training "
        "resolution (0 disables)",
    )
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from position_induced_transformer_tpu.train import runner

    problem, state, history = runner.train("advection", epochs=args.epochs)
    final = history[-1]
    result = {
        "benchmark": "advection",
        "epochs": args.epochs,
        "final_train_loss": final["train_loss"],
        "final_rel_l2": final["rel_l2"],
    }

    if args.zssr_factor:
        # zero-shot super-resolution: params carry no mesh dimension, so
        # the trained model evaluates on a finer discretization by
        # re-binding the Geometry — and because the targets here are the
        # EXACT solution operator, the fine-mesh error is a true
        # generalization measurement, not surrogate noise.
        import jax.numpy as jnp

        from position_induced_transformer_tpu.ops.metrics import rel_lp_norm

        cfg = ADVECTION
        L2 = cfg.grid[0] * args.zssr_factor
        x2, y2 = make_data(cfg.ntest, L2, seed=cfg.seed + 1)
        mesh2 = jnp.asarray(meshes.grid_1d(L2))
        ltt = jnp.asarray(meshes.grid_1d(cfg.latent_grid[0]))
        geom2 = build_geometry_host(
            mesh2, ltt, mesh2, metric=cfg.metric,
            en_loc=cfg.model.en_loc, de_loc=cfg.model.de_loc,
        )
        pred2 = jax.jit(problem.model.apply)(
            {"params": state.params}, geom2, jnp.asarray(x2)
        )
        err = float(rel_lp_norm(jnp.asarray(y2), pred2, out_dim=1, p=2)) / len(x2)
        result["zssr_resolution"] = L2
        result["zssr_rel_l2"] = err

    print(json.dumps(result))


if __name__ == "__main__":
    main()
