"""Env-gated integration tests against the REAL reference datasets.

The reference's empirical claims live on seven external datasets
(reference: README.md:17-24) that are not reachable from CI here (the
bundled .mat files are git-LFS stubs). These tests run the real-data path
end to end the moment a user points ``PIT_REAL_DATA_DIR`` at a
catalog-layout data root (scripts/fetch_data.py downloads/verifies it) —
and skip cleanly otherwise, per benchmark.

    export PIT_REAL_DATA_DIR=/data/pit
    python -m pytest tests/test_real_data.py -q
"""

import os

import numpy as np
import pytest

from position_induced_transformer_tpu.data import catalog

ROOT = catalog.real_data_root()


def _need(bench):
    if ROOT is None:
        pytest.skip("PIT_REAL_DATA_DIR not set")
    if not catalog.available(bench, ROOT):
        pytest.skip(f"real {bench} data not present under {ROOT}")
    return catalog.data_path_for(bench, ROOT)


@pytest.mark.parametrize(
    "bench", ["burgers", "sod", "darcy", "vorticity", "elasticity", "naca",
              "cylinder"]
)
def test_real_data_loads_with_reference_shapes(bench):
    """Loaders produce the reference's exact array contracts on the real
    files (reference: train_*.py load_data shape comments)."""
    path = _need(bench)
    from position_induced_transformer_tpu.data import loaders

    if bench == "burgers":
        x, y, xt, yt = loaders.burgers(path, ntrain=8, ntest=4)
        assert x.shape[1:] == (1024, 1) and y.shape[1:] == (1024, 1)
    elif bench == "sod":
        x, y, xt, yt = loaders.sod(path, ntrain=8, ntest=4)
        assert x.shape[-1] == 3  # primitive (rho, u, p) after transform
        assert (x[..., 0] > 0).all() and (x[..., 2] > 0).all()
    elif bench == "darcy":
        x, y, xt, yt = loaders.darcy(
            os.path.join(path, "piececonst_r421_N1024_smooth1.mat"),
            os.path.join(path, "piececonst_r421_N1024_smooth2.mat"),
            ntrain=8, ntest=4,
        )
        assert x.shape[1:] == (43, 43, 1)
    elif bench == "vorticity":
        x, y, xt, yt = loaders.vorticity(path, ntrain=8, ntest=4)
        assert x.shape[1:] == (64, 64, 10) and y.shape[-1] == 20
    elif bench == "elasticity":
        X, ext, Y, *_ = loaders.elasticity(path, ntrain=8, ntest=4)
        assert X.shape[1:] == (972, 44) and Y.shape[1:] == (972, 1)
    elif bench == "naca":
        c, X, Y, *_ = loaders.naca(path, ntrain=8, ntest=4)
        assert c.shape[1:] == (120, 2) and X.shape[1:] == (221, 51, 2)
        assert Y.shape[-1] == 4
    elif bench == "cylinder":
        x, y, xt, yt, mesh, mesh_ltt, traj, elements = loaders.cylinder(
            os.path.join(path, "WakeCylinder_train.mat"),
            os.path.join(path, "WakeCylinder_test.mat"),
            os.path.join(path, "vertices.csv"),
            os.path.join(path, "vertices_small.csv"),
            ntrain=2, ntest=1,
            elements_path=os.path.join(path, "elements.csv"),
        )
        assert x.shape[1:] == (4390, 3) and mesh.shape == (4390, 2)
    for arr in (x, y) if bench not in ("elasticity", "naca") else (X, Y):
        assert np.isfinite(np.asarray(arr)).all()


@pytest.mark.parametrize("bench", ["burgers", "darcy", "elasticity"])
def test_real_data_short_training_improves(bench):
    """A few real-data epochs through the production runner reduce the
    training loss — the end-to-end smoke a user runs first."""
    _need(bench)
    from position_induced_transformer_tpu.train import runner

    _, _, hist = runner.train(
        bench,
        data_path=catalog.data_path_for(bench, ROOT),
        epochs=3,
        ntrain=32,
        ntest=8,
        verbose=False,
    )
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    assert np.isfinite(hist[-1]["rel_l2"])
