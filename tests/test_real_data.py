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


def test_fetch_script_interstitial_handling(tmp_path, monkeypatch):
    """Offline unit test of the fetch script's Drive handling: the
    confirm form of a large-file interstitial is parsed (action + hidden
    inputs, cookies reused), an HTML payload is never kept under the
    dataset's name, and a present REAL file short-circuits (a stub/HTML
    leftover does not). Runs without network or PIT_REAL_DATA_DIR."""
    import importlib.util
    import io
    import os
    import sys

    spec = importlib.util.spec_from_file_location(
        "fetch_data",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "fetch_data.py"),
    )
    fd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fd)

    html = (b"<!DOCTYPE html><html><body>"
            b'<form id="download-form" '
            b'action="https://drive.usercontent.google.com/download" '
            b'method="get">'
            b'<input type="hidden" name="id" value="FID123">'
            b'<input type="hidden" name="export" value="download">'
            b'<input type="hidden" name="confirm" value="t">'
            b'<input type="hidden" name="uuid" value="abc-def">'
            b"</form></body></html>")

    class FakeResp(io.BytesIO):
        def __init__(self, body, ctype):
            super().__init__(body)
            self.headers = {"Content-Type": ctype}

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    urls = []

    class FakeOpener:
        def open(self, req, timeout=None):
            url = req.full_url if hasattr(req, "full_url") else req
            urls.append(url)
            if url.startswith("https://drive.google.com/uc"):
                return FakeResp(html, "text/html; charset=utf-8")
            return FakeResp(b"REALBYTES" * 4, "application/octet-stream")

    monkeypatch.setattr(
        fd.urllib.request, "build_opener", lambda *a: FakeOpener()
    )

    ids = tmp_path / "ids.json"
    ids.write_text('{"sub/file.npy": "FID123"}')
    failed = fd.fetch_gdrive(str(tmp_path), str(ids))
    assert failed == []
    # the confirm form was submitted with its action URL + hidden inputs
    assert any(
        u.startswith("https://drive.usercontent.google.com/download?")
        and "id=FID123" in u and "uuid=abc-def" in u and "confirm=t" in u
        for u in urls
    )
    dest = tmp_path / "sub" / "file.npy"
    assert dest.read_bytes() == b"REALBYTES" * 4

    # an HTML payload must be removed and reported, not kept
    class HTMLOpener:
        def open(self, req, timeout=None):
            return FakeResp(html, "text/html")

    monkeypatch.setattr(
        fd.urllib.request, "build_opener", lambda *a: HTMLOpener()
    )
    ids2 = tmp_path / "ids2.json"
    ids2.write_text('{"bad.npy": "FIDBAD"}')
    failed = fd.fetch_gdrive(str(tmp_path), str(ids2))
    assert failed == ["bad.npy"]
    assert not (tmp_path / "bad.npy").exists()

    # a real present file short-circuits (no network call)
    urls.clear()
    monkeypatch.setattr(
        fd.urllib.request, "build_opener",
        lambda *a: (_ for _ in ()).throw(AssertionError("network hit")),
    )
    import numpy as np
    np.save(tmp_path / "sub" / "file2.npy", np.zeros(4))
    ids3 = tmp_path / "ids3.json"
    ids3.write_text('{"sub/file2.npy": "FID999"}')
    # presence check must be _is_real_file, not os.path.exists: write an
    # HTML leftover and confirm it does NOT count as present
    (tmp_path / "leftover.npy").write_bytes(html)
    monkeypatch.setattr(
        fd.urllib.request, "build_opener", lambda *a: HTMLOpener()
    )
    ids4 = tmp_path / "ids4.json"
    ids4.write_text('{"leftover.npy": "FIDL"}')
    failed = fd.fetch_gdrive(str(tmp_path), str(ids4))
    assert failed == ["leftover.npy"]  # re-attempted, not "already present"
