"""Checkpoint round-trip + zero-shot super-resolution end to end.

The capability under test is the reference's headline ZSSR flow
(train_darcy.py:151-180): train at a coarse resolution, save, re-bind the
same (resolution-independent) parameters to a finer mesh, evaluate with the
coarse-fit normalizer statistics bilinearly resized.
"""

import dataclasses
import os

import numpy as np
import pytest

from position_induced_transformer_tpu import configs
from position_induced_transformer_tpu.train import evaluate, runner


def _tiny_darcy():
    cfg = configs.DARCY
    model = dataclasses.replace(cfg.model, hid_dim=16, n_blocks=2)
    return dataclasses.replace(cfg, model=model, latent_grid=(8, 8), batch_size=8)


def test_darcy_checkpoint_and_zssr(tmp_path):
    cfg = _tiny_darcy()
    ckpt_path = os.path.join(tmp_path, "ckpt")
    # train at coarse resolution (downsampling 40 -> 11^2)
    problem, state, history = runner.train(
        cfg, epochs=2, ntrain=32, ntest=16, verbose=False,
        checkpoint_path=ckpt_path,
        setup_kwargs={"downsampling": 40},
    )
    assert os.path.exists(ckpt_path) or os.path.exists(ckpt_path + ".msgpack")

    # same-resolution evaluation from the checkpoint reproduces metrics
    res = evaluate.evaluate(
        cfg, checkpoint_path=ckpt_path, ntest=16, zssr=False,
    )
    # (setup defaults to downsampling=10 i.e. 43^2 here — a *different*
    # resolution than training: this exercises resolution transfer too)
    assert np.isfinite(res["rel_l2"])

    # explicit ZSSR at 43^2 with training-resolution normalizer stats
    res_z = evaluate.evaluate(
        cfg, checkpoint_path=ckpt_path, ntest=20, zssr=True,
        zssr_downsampling=10,
    )
    assert res_z["zssr"] and np.isfinite(res_z["rel_l2"])
    assert res_z["n_test"] == 20


def test_darcy_tf_checkpoint_and_zssr(tmp_path):
    """TF-family ZSSR: train darcy_tf coarse, transplant the (resolution-
    independent) weights to a finer grid with the training-resolution
    normalizer statistics (reference: tensorflow/3_Darcy2D/evaluate.py:47-60
    rebuilds the model at qry_res=421 and set_weights from the 43^2 run)."""
    cfg = configs.DARCY_TF
    model = dataclasses.replace(cfg.model, hid_dim=16, n_blocks=2)
    cfg = dataclasses.replace(
        cfg, model=model, latent_grid=(8, 8), batch_size=8
    )
    ckpt_path = os.path.join(tmp_path, "ckpt_tf")
    runner.train(
        cfg, epochs=2, ntrain=32, ntest=16, verbose=False,
        checkpoint_path=ckpt_path, setup_kwargs={"downsampling": 40},
    )
    res_z = evaluate.evaluate(
        cfg, checkpoint_path=ckpt_path, ntest=16, zssr=True,
        zssr_downsampling=10,  # 11^2-trained -> 43^2 eval
    )
    assert res_z["zssr"] and np.isfinite(res_z["rel_l2"])


def test_checkpoint_restores_exact_params(tmp_path):
    import jax

    from position_induced_transformer_tpu.train import checkpoint as ckpt

    cfg = _tiny_darcy()
    path = os.path.join(tmp_path, "p")
    problem, state, _ = runner.train(
        cfg, epochs=1, ntrain=16, ntest=8, verbose=False,
        checkpoint_path=path, setup_kwargs={"downsampling": 40},
    )
    restored = ckpt.restore(path)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored["params"]),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_missing_path_clear_error(tmp_path):
    """A typo'd checkpoint path reports that NO checkpoint exists (either
    format), not a misleading '<path>.msgpack not found'."""
    import pytest

    from position_induced_transformer_tpu.train import checkpoint as ckpt

    with pytest.raises(FileNotFoundError, match="no checkpoint at"):
        ckpt.restore(os.path.join(tmp_path, "nope"))


def test_restore_architecture_mismatch_raises(tmp_path):
    """Restoring with a target of DIFFERENT shapes must raise (the orbax
    mismatch), not silently return the wrong-architecture tree through the
    cross-topology metadata fallback."""
    import jax.numpy as jnp
    import pytest

    from position_induced_transformer_tpu.train import checkpoint as ckpt

    path = os.path.join(tmp_path, "c")
    tree = {"w": jnp.ones((4, 8)), "b": jnp.zeros((8,))}
    saved = ckpt.save(path, tree)
    # same structure restores fine (exercises the target path)
    same = ckpt.restore(saved, target={"w": jnp.zeros((4, 8)),
                                       "b": jnp.zeros((8,))})
    np.testing.assert_array_equal(np.asarray(same["w"]), np.ones((4, 8)))
    # different hidden width: must surface an error
    with pytest.raises(Exception):
        ckpt.restore(saved, target={"w": jnp.zeros((4, 16)),
                                    "b": jnp.zeros((16,))})


def test_save_fallback_removes_stale_orbax_dir(tmp_path, monkeypatch):
    """If orbax saving breaks mid-run, the msgpack fallback must not leave
    an earlier epoch's orbax directory shadowing it on restore."""
    import jax.numpy as jnp

    from position_induced_transformer_tpu.train import checkpoint as ckpt

    path = os.path.join(tmp_path, "c")
    ckpt.save(path, {"w": jnp.ones((2, 2))})  # epoch-N orbax save ok
    assert os.path.isdir(path)

    class _Broken:
        def save(self, *a, **k):
            raise RuntimeError("transient orbax failure")

    monkeypatch.setattr(ckpt, "_checkpointer", lambda: _Broken())
    import warnings as _w

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        fname = ckpt.save(path, {"w": 2.0 * jnp.ones((2, 2))})
    assert any("falling back" in str(r.message) for r in rec)
    assert not os.path.isdir(path)  # stale orbax dir removed
    restored = ckpt.restore(path)  # reads the fresh msgpack
    np.testing.assert_array_equal(
        np.asarray(restored["w"]), 2.0 * np.ones((2, 2))
    )
    assert fname.endswith(".msgpack")


def test_resume_training_matches_uninterrupted(tmp_path):
    """Train 4 epochs straight vs 2 epochs + checkpoint + resume for 2 more:
    identical final parameters (elastic-recovery contract)."""
    import jax

    cfg = _tiny_darcy()
    kw = dict(ntrain=32, ntest=16, verbose=False,
              setup_kwargs={"downsampling": 40})
    _, straight, _ = runner.train(cfg, epochs=4, **kw)

    path = os.path.join(tmp_path, "mid")
    runner.train(cfg, epochs=2, schedule_epochs=4, checkpoint_path=path, **kw)
    _, resumed, _ = runner.train(cfg, epochs=4, resume_from=path, **kw)

    for a, b in zip(
        jax.tree_util.tree_leaves(straight.params),
        jax.tree_util.tree_leaves(resumed.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )


def test_resume_on_mesh_matches_uninterrupted_single_device(tmp_path):
    """Elastic recovery across device topologies: checkpoint a
    single-device run mid-training, resume it on a 4-way data-parallel
    mesh — final parameters match the uninterrupted single-device run.
    (Params carry no mesh placement, so a restart may land on a
    different-size pod.)"""
    import jax
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 (fake) devices")

    cfg = _tiny_darcy()
    kw = dict(ntrain=32, ntest=16, verbose=False,
              setup_kwargs={"downsampling": 40})
    _, straight, _ = runner.train(cfg, epochs=4, **kw)

    path = os.path.join(tmp_path, "mid_mesh")
    runner.train(cfg, epochs=2, schedule_epochs=4, checkpoint_path=path, **kw)
    _, resumed, _ = runner.train(
        cfg, epochs=4, resume_from=path, mesh="data=4", **kw
    )

    for a, b in zip(
        jax.tree_util.tree_leaves(straight.params),
        jax.tree_util.tree_leaves(resumed.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )


def test_legacy_checkpoint_without_x_normalizer_raises_clearly(tmp_path):
    """A darcy checkpoint carrying y_normalizer but no x_normalizer
    (pre-x-normalization format) gets a clear error, not a KeyError."""
    from position_induced_transformer_tpu.train import checkpoint as ckpt

    cfg = _tiny_darcy()
    ckpt_path = os.path.join(tmp_path, "ckpt")
    problem, state, _ = runner.train(
        cfg, epochs=1, ntrain=16, ntest=8, verbose=False,
        checkpoint_path=ckpt_path,
    )
    restored = ckpt.restore(ckpt_path)
    assert "x_normalizer" in restored and "y_normalizer" in restored
    restored.pop("x_normalizer")
    legacy = os.path.join(tmp_path, "legacy")
    ckpt.save(legacy, restored)
    with pytest.raises(ValueError, match="x_normalizer"):
        evaluate.evaluate(cfg, legacy, ntest=8)


def test_restore_from_different_topology_subprocess(tmp_path):
    """A checkpoint written by a multi-device run (here a 2-device
    'stage=2' pipeline mesh) must restore for evaluate/infer/serve on a
    SINGLE device: orbax's saved sharding metadata names devices that do
    not exist there, and checkpoint.restore falls back to rebuilding the
    target from the checkpoint's own shape/dtype metadata with a
    current-device placement (train/checkpoint.py _restore_here).
    Subprocesses are required — device count is fixed per process."""
    import subprocess
    import sys

    env2 = dict(os.environ, XLA_FLAGS="--xla_force_host_platform_device_count=2")
    env1 = dict(os.environ)
    env1.pop("XLA_FLAGS", None)
    ckpt_path = os.path.join(tmp_path, "ckpt")
    r = subprocess.run(
        [
            sys.executable, "-m", "position_induced_transformer_tpu",
            "train", "--benchmark", "sod", "--epochs", "1",
            "--ntrain", "16", "--ntest", "8", "--mesh", "stage=2",
            "--checkpoint", ckpt_path, "--platform", "cpu",
        ],
        capture_output=True, text=True, env=env2,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run(
        [
            sys.executable, "-m", "position_induced_transformer_tpu",
            "evaluate", "--benchmark", "sod", "--ntest", "8",
            "--checkpoint", ckpt_path, "--platform", "cpu",
        ],
        capture_output=True, text=True, env=env1,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import json

    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert np.isfinite(out["rel_l2"])


def test_resume_with_warmup_ramp_crossing_checkpoint(tmp_path):
    """LR warmup (configs.BenchmarkConfig.warmup_steps) must compose with
    elastic recovery: with ntrain=32/bs=8 the 10-step ramp is still active
    at the epoch-2 checkpoint (step 8), so a resumed run continues the
    ramp mid-slope from the optimizer state's step count — identical final
    parameters to the uninterrupted run."""
    import jax

    cfg = dataclasses.replace(_tiny_darcy(), warmup_steps=10)
    kw = dict(ntrain=32, ntest=16, verbose=False,
              setup_kwargs={"downsampling": 40})
    _, straight, _ = runner.train(cfg, epochs=4, **kw)

    path = os.path.join(tmp_path, "mid_warm")
    runner.train(cfg, epochs=2, schedule_epochs=4, checkpoint_path=path, **kw)
    _, resumed, _ = runner.train(cfg, epochs=4, resume_from=path, **kw)

    for a, b in zip(
        jax.tree_util.tree_leaves(straight.params),
        jax.tree_util.tree_leaves(resumed.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )
