"""User-defined benchmark registration (the framework's extension point).

The reference has no such mechanism — each PDE is a copied driver script
(/root/reference/train_burgers.py etc.); here a registered
(BenchmarkConfig, setup_fn) pair becomes a first-class benchmark in every
entry point. examples/custom_problem.py is the documented user path; these
tests cover the API contract and the CLI --problem-module hook.
"""

import dataclasses
import json

import pytest

from position_induced_transformer_tpu import register_benchmark
from position_induced_transformer_tpu.cli import main
from position_induced_transformer_tpu.configs import (
    BenchmarkConfig,
    ModelConfig,
    REGISTRY,
    register,
)
from position_induced_transformer_tpu.train import benchmarks, runner

import os as _os

EXAMPLE = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "examples", "custom_problem.py",
)


def _tiny_cfg(name: str) -> BenchmarkConfig:
    return BenchmarkConfig(
        name=name,
        model=ModelConfig(1, 1, 1, 8, 1, 1, 0.05, 0.05),
        metric="periodic1d",
        ntrain=8, ntest=4, batch_size=4, epochs=2,
        grid=(16,), latent_grid=(8,), periodic_grid=True,
    )


def _tiny_setup(cfg, data_path=None, ntrain=None, ntest=None):
    import jax.numpy as jnp
    import numpy as np

    from position_induced_transformer_tpu.data import meshes
    from position_induced_transformer_tpu.models import build_geometry_host
    from position_induced_transformer_tpu.train.benchmarks import (
        Problem,
        _make_model,
    )
    from position_induced_transformer_tpu.train.loop import Task

    ntrain, ntest = ntrain or cfg.ntrain, ntest or cfg.ntest
    L = cfg.grid[0]
    rng = np.random.default_rng(0)
    x = rng.standard_normal((ntrain + ntest, L, 1)).astype(np.float32)
    y = np.roll(x, 3, axis=1)
    mesh = jnp.asarray(meshes.grid_1d(L))
    ltt = jnp.asarray(meshes.grid_1d(cfg.latent_grid[0]))
    geom = build_geometry_host(
        mesh, ltt, mesh, metric=cfg.metric,
        en_loc=cfg.model.en_loc, de_loc=cfg.model.de_loc,
    )
    model = _make_model(cfg)
    task = Task(model=model, loss_p=cfg.loss_p, out_dim=1)
    return Problem(
        cfg, model, task, geom,
        {"x": jnp.asarray(x[:ntrain]), "y": jnp.asarray(y[:ntrain])},
        {"x": jnp.asarray(x[ntrain:]), "y": jnp.asarray(y[ntrain:])},
        ntrain, ntest,
    )


@pytest.fixture
def _clean_registry():
    """Remove test registrations afterwards (REGISTRY/SETUPS are module
    state shared across the suite)."""
    added = []
    yield added
    for name in added:
        REGISTRY.pop(name, None)
        benchmarks.SETUPS.pop(name, None)


def test_registered_benchmark_trains(_clean_registry):
    cfg = _tiny_cfg("custom_shift")
    register_benchmark(cfg, _tiny_setup)
    _clean_registry.append(cfg.name)

    problem, state, history = runner.train(
        "custom_shift", epochs=2, verbose=False
    )
    assert len(history) == 2
    # shift operator is learnable: the loss must move
    assert history[-1]["train_loss"] < history[0]["train_loss"]
    pred = runner.predict(problem, state)
    assert pred.shape == (cfg.ntest, cfg.grid[0], 1)


def test_duplicate_registration_rejected(_clean_registry):
    cfg = _tiny_cfg("custom_dup")
    register_benchmark(cfg, _tiny_setup)
    _clean_registry.append(cfg.name)
    with pytest.raises(ValueError, match="already registered"):
        register(cfg)
    with pytest.raises(ValueError, match="already registered"):
        benchmarks.register_setup(cfg.name, _tiny_setup)
    # explicit overwrite is allowed
    register_benchmark(cfg, _tiny_setup, overwrite=True)


def test_config_without_setup_is_clean_error(_clean_registry):
    cfg = _tiny_cfg("custom_nosetup")
    register(cfg)
    _clean_registry.append(cfg.name)
    with pytest.raises(ValueError, match="no setup registered"):
        benchmarks.setup(cfg)


def test_cli_problem_module_file(capsys, _clean_registry):
    """--problem-module accepts a .py path; the example registers
    'advection' and describe/benchmarks see it."""
    _clean_registry.append("advection")
    assert main([
        "describe", "--benchmark", "advection",
        "--problem-module", EXAMPLE, "--platform", "cpu",
    ]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["benchmark"] == "advection"
    assert info["model"] == "PiT"

    assert main(["benchmarks", "--problem-module", EXAMPLE]) == 0
    assert "advection" in capsys.readouterr().out


def test_cli_problem_module_with_overrides_and_mesh(capsys, _clean_registry):
    """Custom benchmark composes with --set and --mesh (fake 8-device CPU
    mesh from conftest)."""
    _clean_registry.append("advection")
    assert main([
        "train", "--benchmark", "advection",
        "--problem-module", EXAMPLE, "--platform", "cpu",
        "--epochs", "2", "--ntrain", "16", "--ntest", "8",
        "--set", "model.hid_dim=8", "--set", "grid=32",
        "--set", "latent_grid=8", "--mesh", "data=2",
    ]) == 0
    out = capsys.readouterr().out
    final = json.loads(out.strip().splitlines()[-1])["final"]
    assert final["epoch"] == 1
    assert final["train_loss"] > 0


def _normalizing_setup(cfg, data_path=None, ntrain=None, ntest=None,
                       normalizers=None):
    """A custom setup following the darcy pattern: fits x/y normalizers on
    the training split unless checkpoint-restored stats are passed back in
    via the ``normalizers`` kwarg (capability detected by evaluate/infer)."""
    import jax.numpy as jnp
    import numpy as np

    from position_induced_transformer_tpu.data import meshes
    from position_induced_transformer_tpu.models import build_geometry_host
    from position_induced_transformer_tpu.ops.normalization import (
        PixelWiseNormalizer,
    )
    from position_induced_transformer_tpu.train.benchmarks import (
        Problem,
        _make_model,
    )
    from position_induced_transformer_tpu.train.loop import Task

    ntrain, ntest = ntrain or cfg.ntrain, ntest or cfg.ntest
    L = cfg.grid[0]
    rng = np.random.default_rng(0)
    x = (3.0 + 2.0 * rng.standard_normal((ntrain + ntest, L, 1))).astype(
        np.float32
    )
    y = np.roll(x, 2, axis=1) * 0.5
    x, y = jnp.asarray(x), jnp.asarray(y)
    if normalizers is not None:
        x_norm, y_norm = normalizers
    else:
        x_norm = PixelWiseNormalizer.fit(x[:ntrain])
        y_norm = PixelWiseNormalizer.fit(y[:ntrain])
    xn = x_norm.normalize(x)
    mesh = jnp.asarray(meshes.grid_1d(L))
    ltt = jnp.asarray(meshes.grid_1d(cfg.latent_grid[0]))
    geom = build_geometry_host(
        mesh, ltt, mesh, metric=cfg.metric,
        en_loc=cfg.model.en_loc, de_loc=cfg.model.de_loc,
    )
    model = _make_model(cfg)
    task = Task(
        model=model, loss_p=cfg.loss_p, out_dim=1,
        postprocess=lambda out: y_norm.denormalize(out),
    )
    return Problem(
        cfg, model, task, geom,
        {"x": xn[:ntrain], "y": y[:ntrain]},
        {"x": xn[ntrain:], "y": y[ntrain:]},
        ntrain, ntest,
        x_normalizer=x_norm, y_normalizer=y_norm,
    )


def test_custom_benchmark_normalizer_restore(_clean_registry, tmp_path):
    """evaluate.Predictor restores checkpoint normalizer statistics for a
    CUSTOM benchmark whose setup declares the ``normalizers`` kwarg —
    capability detection, not the old hardcoded darcy-name gate (which
    silently refit user stats on the minimal serving split)."""
    import numpy as np

    from position_induced_transformer_tpu.train import evaluate

    cfg = dataclasses.replace(
        _tiny_cfg("custom_norm"), normalize_x=True, normalize_y=True,
        ntrain=16, ntest=8, batch_size=4,
    )
    register_benchmark(cfg, _normalizing_setup)
    _clean_registry.append(cfg.name)

    ckpt = str(tmp_path / "ckpt")
    problem, state, _ = runner.train(
        cfg, epochs=1, verbose=False, checkpoint_path=ckpt
    )
    predictor = evaluate.Predictor(cfg.name, ckpt)
    # the Predictor's problem is built on a MINIMAL split, so equality of
    # the stats proves they came from the checkpoint, not a refit
    np.testing.assert_allclose(
        np.asarray(predictor.problem.x_normalizer.mean),
        np.asarray(problem.x_normalizer.mean), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(predictor.problem.y_normalizer.std),
        np.asarray(problem.y_normalizer.std), atol=1e-6,
    )
    # deployment inference (RAW inputs through the file path) matches the
    # training-process predict path
    x_raw = np.asarray(
        problem.x_normalizer.denormalize(problem.test_data["x"])
    )
    npy = tmp_path / "inputs.npy"
    np.save(npy, x_raw)
    got = predictor.predict_file(str(npy))
    want = runner.predict(problem, state)
    np.testing.assert_allclose(got, want, atol=1e-5)


def _point_cloud_setup(cfg, data_path=None, ntrain=None, ntest=None):
    """Custom problem on PER-SAMPLE point clouds (the elasticity pattern):
    geom=None + Task.geom_fn rebuilding a lazy Geometry from each batch's
    coordinates — the hardest extension shape (batched Pallas kernels on
    TPU, XLA fallback elsewhere)."""
    import dataclasses as dc

    import jax.numpy as jnp
    import numpy as np

    from position_induced_transformer_tpu.models import build_geometry
    from position_induced_transformer_tpu.train.benchmarks import (
        Problem,
        _make_model,
    )
    from position_induced_transformer_tpu.train.loop import Task

    ntrain, ntest = ntrain or cfg.ntrain, ntest or cfg.ntest
    L = 24
    rng = np.random.default_rng(0)
    mesh = rng.uniform(0, 1, (ntrain + ntest, L, 2)).astype(np.float32)
    x = rng.standard_normal((ntrain + ntest, L, 1)).astype(np.float32)
    # target couples the feature to the cloud coordinates
    y = (x * np.sin(np.pi * mesh.sum(-1, keepdims=True))).astype(np.float32)

    model = _make_model(cfg)

    def geom_fn(batch):
        m = batch["mesh"]
        return build_geometry(
            m, m, m, metric=cfg.metric,
            en_loc=cfg.model.en_loc, de_loc=cfg.model.de_loc, lazy=True,
        )

    task = Task(
        model=model, loss_p=cfg.loss_p, out_dim=1,
        geom_fn=geom_fn, geometry_required_keys=("mesh",),
    )
    split = lambda a: (jnp.asarray(a[:ntrain]), jnp.asarray(a[ntrain:]))
    x_tr, x_te = split(x)
    m_tr, m_te = split(mesh)
    y_tr, y_te = split(y)
    return Problem(
        cfg, model, task, None,
        {"x": x_tr, "mesh": m_tr, "y": y_tr},
        {"x": x_te, "mesh": m_te, "y": y_te},
        ntrain, ntest,
    )


def test_custom_per_sample_geometry_trains_and_infers(_clean_registry,
                                                      tmp_path):
    """The extension contract holds for per-sample-geometry problems:
    train end-to-end, then deployment inference from a .mat carrying both
    the features and the per-sample coordinates."""
    import numpy as np
    from scipy.io import savemat

    from position_induced_transformer_tpu.train import evaluate

    cfg = BenchmarkConfig(
        name="custom_cloud",
        model=ModelConfig(
            2, 1, 1, 8, 1, 1, 0.3, 0.3, concat_mesh=False,
        ),
        metric="euclidean",
        ntrain=8, ntest=4, batch_size=4, epochs=2,
    )
    register_benchmark(cfg, _point_cloud_setup)
    _clean_registry.append(cfg.name)

    ckpt = str(tmp_path / "ckpt")
    problem, state, history = runner.train(
        cfg.name, epochs=2, verbose=False, checkpoint_path=ckpt
    )
    assert history[-1]["train_loss"] < history[0]["train_loss"]

    mat = tmp_path / "batch.mat"
    savemat(str(mat), {
        "x": np.asarray(problem.test_data["x"]),
        "mesh": np.asarray(problem.test_data["mesh"]),
    })
    predictor = evaluate.Predictor(cfg.name, ckpt)
    got = predictor.predict_file(str(mat))
    want = runner.predict(problem, state)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_zssr_gate_is_capability_based(_clean_registry, tmp_path):
    """--zssr rejects benchmarks whose setup lacks a 'downsampling' kwarg
    with a clear message (capability gate, not a hardcoded name list)."""
    from position_induced_transformer_tpu.train import evaluate

    cfg = _tiny_cfg("custom_nozssr")
    register_benchmark(cfg, _tiny_setup)
    _clean_registry.append(cfg.name)
    ckpt = str(tmp_path / "ckpt")
    runner.train(cfg, epochs=1, verbose=False, checkpoint_path=ckpt)
    with pytest.raises(ValueError, match="downsampling"):
        evaluate.evaluate(cfg.name, checkpoint_path=ckpt, zssr=True)


def test_register_benchmark_atomic_rollback(_clean_registry):
    """If the setup half fails, the config half is rolled back."""
    cfg = _tiny_cfg("custom_atomic")
    benchmarks.register_setup(cfg.name, _tiny_setup)  # setup exists,
    _clean_registry.append(cfg.name)                  # config does not
    with pytest.raises(ValueError, match="already registered"):
        register_benchmark(cfg, _tiny_setup)
    assert cfg.name not in REGISTRY  # not left half-registered


def test_problem_module_does_not_shadow_stdlib(tmp_path, capsys):
    """A user file named like a stdlib module must not clobber it in
    sys.modules for the rest of the process."""
    import sys

    mod = tmp_path / "json.py"
    mod.write_text("REGISTERED = True\n")
    assert main(["benchmarks", "--problem-module", str(mod)]) == 0
    capsys.readouterr()
    import json as stdlib_json

    assert sys.modules["json"] is stdlib_json
    assert hasattr(stdlib_json, "dumps")


def test_problem_module_dotted_form_reregisters(tmp_path, capsys,
                                                _clean_registry):
    """The dotted-module form registers on first use and RE-registers on a
    second cli.main() in the same process (importlib.reload — parity with
    the .py-path form, which always executes)."""
    import sys

    mod = tmp_path / "my_problems.py"
    mod.write_text(
        "import tests.test_custom_problem as t\n"
        "import position_induced_transformer_tpu as pit\n"
        "pit.register_benchmark(t._tiny_cfg('custom_dotted'), t._tiny_setup,"
        " overwrite=True)\n"
    )
    _clean_registry.append("custom_dotted")
    sys.path.insert(0, str(tmp_path))
    try:
        assert main(["benchmarks", "--problem-module", "my_problems"]) == 0
        assert "custom_dotted" in capsys.readouterr().out
        # simulate cleanup between CLI calls in one process
        REGISTRY.pop("custom_dotted", None)
        benchmarks.SETUPS.pop("custom_dotted", None)
        assert main(["benchmarks", "--problem-module", "my_problems"]) == 0
        assert "custom_dotted" in capsys.readouterr().out
    finally:
        sys.path.remove(str(tmp_path))
        sys.modules.pop("my_problems", None)


def test_problem_module_exec_failure_not_cached(tmp_path):
    """A module that raises at import time is removed from sys.modules so
    a fixed retry re-executes it."""
    import sys

    mod = tmp_path / "broken_problem.py"
    mod.write_text("raise RuntimeError('boom')\n")
    with pytest.raises(RuntimeError, match="boom"):
        main(["benchmarks", "--problem-module", str(mod)])
    assert "_pit_problem_broken_problem" not in sys.modules


def test_custom_benchmark_served(_clean_registry, tmp_path):
    """A registered custom benchmark works through the serving stack
    (train -> checkpoint -> make_server -> POST /predict == predict)."""
    import io
    import threading
    import urllib.request

    import numpy as np

    from position_induced_transformer_tpu.train.serve import make_server

    cfg = _tiny_cfg("custom_served")
    register_benchmark(cfg, _tiny_setup)
    _clean_registry.append(cfg.name)

    ckpt = str(tmp_path / "ckpt")
    problem, state, _ = runner.train(
        cfg, epochs=1, verbose=False, checkpoint_path=ckpt
    )
    server = make_server(cfg, ckpt, host="127.0.0.1", port=0, verbose=False)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        x = np.asarray(problem.test_data["x"])
        buf = io.BytesIO()
        np.save(buf, x)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST",
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            served = np.load(io.BytesIO(resp.read()))
        direct = runner.predict(problem, state)
        np.testing.assert_allclose(served, direct, atol=1e-5)
    finally:
        server.shutdown()
        server.server_close()


def test_example_exact_operator():
    """The example's training targets are the exact spectral solution:
    check the advection-diffusion operator against a closed-form single
    mode (sin advects by c*t and decays by exp(-nu k^2 t))."""
    import numpy as np

    import importlib.util
    import os
    import sys

    path = os.path.abspath(EXAMPLE)
    spec = importlib.util.spec_from_file_location("custom_problem_ex", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["custom_problem_ex"] = mod
    spec.loader.exec_module(mod)
    try:
        L, c, nu, t = 128, 0.3, 1e-2, 0.7
        x = np.linspace(0, 1, L, endpoint=False)
        k = 2 * np.pi * 2  # mode 2
        u0 = np.sin(k * x)[None, :]
        got = mod.advection_diffusion_exact(u0, c, nu, t)
        want = np.exp(-nu * k**2 * t) * np.sin(k * (x - c * t))[None, :]
        np.testing.assert_allclose(got, want, atol=1e-6)
    finally:
        REGISTRY.pop("advection", None)
        benchmarks.SETUPS.pop("advection", None)
