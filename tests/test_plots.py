"""Plot artifacts: every benchmark family produces its reference-style
figures without error."""

import dataclasses
import os

import numpy as np
import pytest

from position_induced_transformer_tpu import configs
from position_induced_transformer_tpu.train import benchmarks, runner
from position_induced_transformer_tpu.train.plots import save_benchmark_plots


@pytest.mark.parametrize(
    "name,shrink,setup_kwargs",
    [
        ("burgers", dict(grid=(32,), latent_grid=(8,), batch_size=4), {}),
        ("darcy", dict(grid=(22, 22), latent_grid=(8, 8), batch_size=4), {"downsampling": 20}),
        ("vorticity", dict(grid=(8, 8), latent_grid=(4, 4), rollout_steps=2, memory=3, batch_size=4), {}),
        ("elasticity", dict(batch_size=4), {"n_points": 32}),
        ("cylinder", dict(batch_size=4), {"n_points": 32, "n_latent": 8}),
    ],
)
def test_plots_render(tmp_path, name, shrink, setup_kwargs):
    cfg = configs.get(name)
    model = dataclasses.replace(cfg.model, hid_dim=8, n_blocks=1)
    cfg = dataclasses.replace(cfg, model=model, **shrink)
    problem = benchmarks.setup(cfg, ntrain=8, ntest=4, **setup_kwargs)
    optimizer = runner.make_optimizer(cfg.lr, 4)
    state = runner.init_state(problem, optimizer)
    if cfg.rollout_steps:
        pred = np.asarray(
            problem.task.rollout(
                state.params, problem.geom, problem.test_data["x"],
                cfg.rollout_steps,
            )
        )
    else:
        pred = runner.predict(problem, state)
    out = save_benchmark_plots(problem, pred, str(tmp_path / name))
    assert len(os.listdir(out)) > 0
    if name == "cylinder":
        # tricontourf over element connectivity, not a scatter fallback
        # (reference: train_cylinder.py:159-202)
        assert problem.extras["elements"].shape[-1] == 3
        assert {"true_var1.pdf", "pred_var1.pdf", "err_var1.pdf"} <= set(
            os.listdir(out)
        )


def test_rollout_evaluate_emits_step_error_plot(tmp_path):
    """`evaluate --plots` for a rollout benchmark writes the rel-L2-vs-step
    curve (reference: tensorflow/4_Vorticity/evaluate.py:20-27) plus
    prediction frames."""
    import dataclasses
    import os

    from position_induced_transformer_tpu import configs
    from position_induced_transformer_tpu.train import evaluate, runner

    cfg = dataclasses.replace(
        configs.VORTICITY,
        grid=(16, 16), latent_grid=(8, 8),
        rollout_steps=3, memory=4, batch_size=8,
        model=dataclasses.replace(
            configs.VORTICITY.model, hid_dim=16, n_blocks=2
        ),
    )
    ckpt = os.path.join(tmp_path, "ckpt")
    runner.train(
        cfg, epochs=1, ntrain=16, ntest=8, verbose=False,
        checkpoint_path=ckpt,
    )
    plots = os.path.join(tmp_path, "plots")
    res = evaluate.evaluate(
        cfg, checkpoint_path=ckpt, ntest=8, plots_dir=plots
    )
    assert len(res["rel_l2_step"]) == 3
    assert os.path.exists(os.path.join(plots, "rollout_error.png"))
    assert any(f.startswith("frame") or f.startswith("rollout")
               for f in os.listdir(plots))
