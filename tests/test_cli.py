"""CLI behavior tests (argument handling; training smoke is covered by the
e2e suite and driven end-to-end in verification)."""

import json

import pytest

from position_induced_transformer_tpu.cli import main


def test_benchmarks_lists_all(capsys):
    assert main(["benchmarks"]) == 0
    out = capsys.readouterr().out
    for name in (
        "burgers", "sod", "darcy", "vorticity", "elasticity", "naca",
        "cylinder", "burgers_tf", "sod_tf", "darcy_tf", "vorticity_tf",
        "elasticity_tf", "naca_tf",
    ):
        assert name in out


def test_unknown_benchmark_is_clean_error():
    with pytest.raises(ValueError, match="unknown benchmark"):
        main(["train", "--benchmark", "nope", "--epochs", "1"])


def test_train_reproducible_with_seed(tmp_path):
    """Same seed -> identical training history (determinism contract the
    reference approximates with global seeds, pit.py:2-6)."""
    import dataclasses

    from position_induced_transformer_tpu import configs
    from position_induced_transformer_tpu.train import runner

    cfg = dataclasses.replace(
        configs.BURGERS,
        grid=(32,), latent_grid=(8,), batch_size=4,
        model=dataclasses.replace(configs.BURGERS.model, hid_dim=8, n_blocks=1),
    )
    histories = []
    for _ in range(2):
        _, _, h = runner.train(
            cfg, epochs=2, ntrain=8, ntest=4, seed=7, verbose=False
        )
        histories.append([(r["train_loss"], r["rel_l2"]) for r in h])
    assert histories[0] == histories[1]


def test_train_cli_mesh_flag(capsys):
    """`train --mesh data=2,model=2` runs through the production runner on
    the fake 8-device mesh and produces finite metrics."""
    assert (
        main(
            [
                "train", "--benchmark", "burgers", "--mesh", "data=2,model=2",
                "--epochs", "1", "--ntrain", "16", "--ntest", "8",
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    final = json.loads(out.strip().splitlines()[-1])["final"]
    import numpy as np

    assert np.isfinite([final["train_loss"], final["rel_l2"]]).all()


def test_train_ntrain_below_batch_is_clean_error():
    """ntrain < batch_size used to crash deep inside optax
    (cosine_decay_schedule decay_steps=0); it must be a clear error at
    the entry point."""
    with pytest.raises(ValueError, match="zero whole training batches"):
        main(
            [
                "train", "--benchmark", "burgers", "--epochs", "1",
                "--ntrain", "4", "--ntest", "8",  # burgers batch_size=8
            ]
        )


def test_train_cli_mesh_bad_spec_is_clean_error():
    with pytest.raises(ValueError, match="mesh"):
        main(
            [
                "train", "--benchmark", "burgers", "--mesh", "rows=3",
                "--epochs", "1", "--ntrain", "8", "--ntest", "8",
            ]
        )


def test_infer_cli_end_to_end(tmp_path, capsys):
    """train --checkpoint, then `infer --input batch.npy --output pred.npy`
    — the deployment flow — produces predictions for every input sample."""
    import numpy as np

    ckpt = str(tmp_path / "ckpt")
    assert (
        main(
            [
                "train", "--benchmark", "burgers", "--epochs", "1",
                "--ntrain", "16", "--ntest", "8", "--checkpoint", ckpt,
            ]
        )
        == 0
    )
    capsys.readouterr()
    x = np.random.default_rng(0).random((3, 1024, 1)).astype(np.float32)
    inp = str(tmp_path / "inp.npy")
    out = str(tmp_path / "pred.npy")
    np.save(inp, x)
    assert (
        main(
            [
                "infer", "--benchmark", "burgers", "--checkpoint", ckpt,
                "--input", inp, "--output", out,
            ]
        )
        == 0
    )
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["n"] == 3
    pred = np.load(out)
    assert pred.shape[0] == 3 and np.isfinite(pred).all()


def test_convert_torch_checkpoint_roundtrip(tmp_path):
    """`convert --from-torch` imports a real reference model.pth
    ({'model_state': state_dict}, train_burgers.py:116) into our
    checkpoint format — validated against the benchmark's parameter
    structure — and `convert --to-torch` round-trips it bitwise."""
    import json
    import os

    import numpy as np
    import pytest

    from reference_oracle import load_reference

    ref = load_reference()
    if ref is None:
        pytest.skip("torch reference unavailable")
    import torch

    ref_pit, _ = ref
    mesh_ltt = torch.linspace(0, 1, 257)[:-1].reshape(-1, 1)
    tmod = ref_pit.pit_periodic1d(
        space_dim=1, in_dim=1, out_dim=1, hid_dim=64, n_head=2, n_blocks=5,
        mesh_ltt=mesh_ltt, en_loc=0.02, de_loc=0.02,
    )
    pth = os.path.join(tmp_path, "model.pth")
    torch.save({"model_state": tmod.state_dict()}, pth)

    ours = os.path.join(tmp_path, "ckpt")
    assert (
        main(
            [
                "convert", "--benchmark", "burgers",
                "--from-torch", pth, "--to", ours,
            ]
        )
        == 0
    )
    back = os.path.join(tmp_path, "back.pth")
    assert (
        main(
            [
                "convert", "--benchmark", "burgers",
                "--from", ours, "--to-torch", back,
            ]
        )
        == 0
    )
    orig = tmod.state_dict()
    rt = torch.load(back, weights_only=True)["model_state"]
    assert set(rt) == set(orig)
    for k in orig:
        np.testing.assert_array_equal(rt[k].numpy(), orig[k].numpy())

    # the imported checkpoint is directly usable by the eval stack
    from position_induced_transformer_tpu.train import evaluate

    res = evaluate.evaluate("burgers", checkpoint_path=ours, ntest=8)
    assert np.isfinite(res["rel_l2"])


def test_convert_structure_mismatch_is_clean_error(tmp_path):
    """Importing a .pth whose architecture differs from the benchmark is
    rejected with a clear error, not a silent bad checkpoint."""
    import os

    import pytest

    torch = pytest.importorskip("torch")

    pth = os.path.join(tmp_path, "model.pth")
    # wrong shapes everywhere: a minimal fake state dict
    torch.save(
        {"model_state": {"down.lmda": torch.zeros(1, 1, 2)}}, pth
    )
    with pytest.raises(ValueError, match="do not match benchmark"):
        main(
            [
                "convert", "--benchmark", "burgers",
                "--from-torch", pth, "--to", os.path.join(tmp_path, "out"),
            ]
        )


def test_config_overrides_unit():
    """configs.apply_overrides: typed parsing per field (ints, floats,
    bools, tuple grids, dotted model.* paths) + clean errors."""
    import pytest

    from position_induced_transformer_tpu import configs

    cfg = configs.apply_overrides(
        configs.get("burgers"),
        [
            "model.hid_dim=128", "lr=3e-4", "latent_grid=16,16",
            "epochs=10", "model.fused_kernel=false", "seed=3",
        ],
    )
    assert cfg.model.hid_dim == 128
    assert cfg.lr == 3e-4
    assert cfg.latent_grid == (16, 16)
    assert cfg.epochs == 10
    assert cfg.model.fused_kernel is False
    assert cfg.seed == 3
    with pytest.raises(ValueError, match="unknown config field"):
        configs.apply_overrides(cfg, ["hid_dim=1"])  # needs model. prefix
    with pytest.raises(ValueError, match="key=value"):
        configs.apply_overrides(cfg, ["model.hid_dim"])
    with pytest.raises(ValueError, match="boolean"):
        configs.apply_overrides(cfg, ["model.fused_kernel=maybe"])


def test_train_cli_set_overrides(capsys, tmp_path):
    """`train --set model.hid_dim=8 --set grid=32 ...` trains the
    overridden architecture end to end (the reference requires editing
    module constants, train_burgers.py:51-57); describe reflects the
    overridden parameter count."""
    import json
    import os

    rc = main(
        [
            "train", "--benchmark", "burgers", "--epochs", "1",
            "--ntrain", "8", "--ntest", "4", "--platform", "cpu",
            "--set", "grid=32", "--set", "latent_grid=8",
            "--set", "model.hid_dim=8", "--set", "model.n_blocks=1",
            "--set", "batch_size=4",
            "--checkpoint", os.path.join(tmp_path, "ckpt"),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    final = json.loads(out[-1])["final"]
    assert final["epoch"] == 0

    # the checkpoint matches the overridden architecture (hid 8)
    from position_induced_transformer_tpu.train import checkpoint as ckpt

    restored = ckpt.restore(os.path.join(tmp_path, "ckpt"))
    lmda = restored["params"]["down"]["lmda"]
    assert lmda.shape[0] == 2  # n_head unchanged
