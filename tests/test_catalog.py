"""data/catalog.py + CLI real-data resolution (no real data required)."""

import os

import numpy as np

from position_induced_transformer_tpu.data import catalog


def _fake_layout(root, bench):
    """Create real-enough files for ``available()`` (which only checks
    existence + non-LFS-stub size)."""
    for f in catalog.dataset_for(bench).files:
        p = os.path.join(root, f)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        np.save(open(p, "wb"), np.zeros(400, np.float32))  # > stub size


def test_data_path_for_resolves_canonical_layout(tmp_path):
    root = str(tmp_path)
    assert catalog.data_path_for("burgers", root) is None  # nothing there
    _fake_layout(root, "burgers")
    assert catalog.data_path_for("burgers", root) == os.path.join(
        root, "data_burgers.mat"
    )
    # tf variants share the raw files
    assert catalog.data_path_for("burgers_tf", root) == os.path.join(
        root, "data_burgers.mat"
    )
    _fake_layout(root, "darcy")
    assert catalog.data_path_for("darcy", root) == os.path.join(root, "darcy")
    # unknown / user-registered benchmarks have no catalog entry
    assert catalog.dataset_for("my_custom_problem") is None


def test_cli_resolution_prefers_explicit_then_env(tmp_path, monkeypatch):
    from position_induced_transformer_tpu.cli import _resolve_data_path

    root = str(tmp_path)
    _fake_layout(root, "sod")

    class A:
        benchmark = "sod"
        data_path = None

    # env root -> resolved file
    monkeypatch.setenv("PIT_REAL_DATA_DIR", root)
    assert _resolve_data_path(A()) == os.path.join(root, "data_sod.mat")
    # explicit root dir -> resolved file
    monkeypatch.delenv("PIT_REAL_DATA_DIR")
    a = A()
    a.data_path = root
    assert _resolve_data_path(a) == os.path.join(root, "data_sod.mat")
    # explicit non-catalog path passes through untouched
    a.data_path = str(tmp_path / "my_own.mat")
    assert _resolve_data_path(a) == a.data_path
    # no path, no env -> synthetic (None)
    assert _resolve_data_path(A()) is None
