"""HTTP model server: warm-checkpoint serving over the infer conventions.

The reference has no serving entry point (its evaluate scripts are batch
jobs over the benchmark test split, e.g.
tensorflow/5_Elasticity/evaluate.py); this is TPU-deployment surface:
compile once, answer many requests.
"""

import dataclasses
import io
import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from position_induced_transformer_tpu import configs
from position_induced_transformer_tpu.train import runner


@pytest.fixture(scope="module")
def burgers_server():
    """A tiny trained burgers model served on an ephemeral port."""
    import tempfile

    from position_induced_transformer_tpu.train.serve import make_server

    cfg = dataclasses.replace(
        configs.BURGERS,
        grid=(64,), latent_grid=(16,), batch_size=8,
        model=dataclasses.replace(configs.BURGERS.model, hid_dim=16, n_blocks=2),
    )
    with tempfile.TemporaryDirectory() as tmp:
        ckpt = os.path.join(tmp, "ckpt")
        problem, state, _ = runner.train(
            cfg, epochs=1, ntrain=16, ntest=8, verbose=False,
            checkpoint_path=ckpt,
        )
        server = make_server(
            cfg, ckpt, host="127.0.0.1", port=0, verbose=False
        )
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        port = server.server_address[1]
        _SERVERS["burgers"] = server  # for failure-injection tests
        try:
            yield f"http://127.0.0.1:{port}", problem, state
        finally:
            _SERVERS.pop("burgers", None)
            server.shutdown()
            server.server_close()


_SERVERS: dict = {}


def _post(url, body, **params):
    from urllib.parse import urlencode

    q = ("?" + urlencode(params)) if params else ""
    req = urllib.request.Request(
        url + q, data=body, method="POST",
        headers={"Content-Type": "application/octet-stream"},
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_health_and_info(burgers_server):
    base, _, _ = burgers_server
    with urllib.request.urlopen(base + "/health") as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    assert health["benchmark"] == "burgers"
    with urllib.request.urlopen(base + "/info") as r:
        info = json.loads(r.read())
    assert info["hid_dim"] == 16 and info["input_shape"] == [64, 1]


def test_predict_npy_roundtrip_matches_predict(burgers_server):
    """POST an .npy batch; the response equals runner.predict — and a
    second request at the same shape reuses the warm executable."""
    base, problem, state = burgers_server
    x = np.asarray(problem.test_data["x"])[:5]  # odd n: tail padding
    buf = io.BytesIO()
    np.save(buf, x)
    status, body = _post(base + "/predict", buf.getvalue())
    assert status == 200, body
    pred = np.load(io.BytesIO(body))
    want = runner.predict(problem, state, data={"x": problem.test_data["x"][:5]})
    np.testing.assert_allclose(pred, want, rtol=1e-5, atol=1e-6)
    # warm second call, .mat response format
    status, body = _post(base + "/predict", buf.getvalue(), format="mat")
    assert status == 200
    from scipy.io import loadmat

    pred2 = loadmat(io.BytesIO(body))["pred"]
    np.testing.assert_allclose(pred2, want, rtol=1e-5, atol=1e-6)
    with urllib.request.urlopen(base + "/health") as r:
        assert json.loads(r.read())["requests"] == 2


def test_predict_bad_payloads_are_400(burgers_server):
    base, _, _ = burgers_server
    status, body = _post(base + "/predict", b"not a tensor at all")
    assert status == 400
    assert "unrecognized input payload" in json.loads(body)["error"]
    # wrong sample shape -> benchmark validation error surfaced as 400
    buf = io.BytesIO()
    np.save(buf, np.ones((2, 7, 3), np.float32))
    status, body = _post(base + "/predict", buf.getvalue())
    assert status == 400
    assert "does not match" in json.loads(body)["error"]
    # unknown endpoint
    status, body = _post(base + "/nope", b"")
    assert status == 404
    # truncated HDF5 body: h5py raises OSError, which must surface as a
    # 400 JSON error, not a dropped connection
    status, body = _post(base + "/predict", b"\x89HDF\r\n\x1a\ngarbage")
    assert status == 400
    assert "error" in json.loads(body)


def test_request_validation_limits(burgers_server):
    """Empty batches, bad rollout horizons and bad batch sizes are clean
    400s (an empty batch previously died as np.concatenate([]); an
    unbounded rollout_steps is a per-value XLA compile a client could
    storm the worker with)."""
    base, problem, _ = burgers_server
    x = np.asarray(problem.test_data["x"])[:2]
    buf = io.BytesIO()
    np.save(buf, x)
    good = buf.getvalue()

    empty = io.BytesIO()
    np.save(empty, x[:0])
    status, body = _post(base + "/predict", empty.getvalue())
    assert status == 400
    assert "empty" in json.loads(body)["error"]

    status, body = _post(base + "/predict", good, rollout_steps=-1)
    assert status == 400
    assert "rollout_steps" in json.loads(body)["error"]
    status, body = _post(base + "/predict", good, rollout_steps=10**6)
    assert status == 400
    assert "rollout_steps" in json.loads(body)["error"]

    status, body = _post(base + "/predict", good, batch_size=0)
    assert status == 400
    assert "batch_size" in json.loads(body)["error"]


def test_device_failures_are_500_and_worker_survives(burgers_server):
    """Errors raised from the execution phase (device/relay failures) are
    retryable 500s, not client-blaming 400s — and the singleton batcher
    worker survives to serve the next request."""
    base, problem, _ = burgers_server
    server = _SERVERS["burgers"]
    x = np.asarray(problem.test_data["x"])[:1]
    buf = io.BytesIO()
    np.save(buf, x)

    orig = server.predictor.predict_array
    calls = {"n": 0}

    def failing(*a, **k):
        calls["n"] += 1
        raise RuntimeError("relay dropped mid-predict")

    server.predictor.predict_array = failing
    try:
        status, body = _post(base + "/predict", buf.getvalue())
    finally:
        server.predictor.predict_array = orig
    assert status == 500
    assert "relay dropped" in json.loads(body)["error"]
    assert calls["n"] == 1
    # worker alive: the same request now succeeds
    status, body = _post(base + "/predict", buf.getvalue())
    assert status == 200
    assert np.load(io.BytesIO(body)).shape[0] == 1


def test_concurrent_requests_are_batched(burgers_server):
    """Dynamic batching: 8 concurrent single-sample requests coalesce
    into fewer device calls than requests (the worker drains the queue
    per free slot), and every client still gets ITS OWN correct rows."""
    import concurrent.futures

    base, problem, state = burgers_server
    with urllib.request.urlopen(base + "/health") as r:
        before = json.loads(r.read())

    xs = np.asarray(problem.test_data["x"])[:8]

    def one(i):
        buf = io.BytesIO()
        np.save(buf, xs[i : i + 1])
        status, body = _post(base + "/predict", buf.getvalue())
        assert status == 200, body
        return i, np.load(io.BytesIO(body))

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        results = dict(ex.map(one, range(8)))

    want = runner.predict(problem, state, data={"x": problem.test_data["x"][:8]})
    for i in range(8):
        assert results[i].shape[0] == 1
        np.testing.assert_allclose(
            results[i][0], want[i], rtol=1e-5, atol=1e-6
        )
    with urllib.request.urlopen(base + "/health") as r:
        after = json.loads(r.read())
    n_req = after["requests"] - before["requests"]
    n_dev = after["device_calls"] - before["device_calls"]
    assert n_req == 8
    # the first request may run alone before the others queue; the rest
    # must have been coalesced (strictly fewer device calls than requests)
    assert n_dev < n_req, (n_dev, n_req)


def test_serve_rollout_benchmark(tmp_path):
    """Serving an autoregressive benchmark: /predict rolls each input
    state forward for the benchmark's horizon (or a per-request
    ?rollout_steps override)."""
    from position_induced_transformer_tpu.train.serve import make_server

    cfg = dataclasses.replace(
        configs.VORTICITY,
        grid=(16, 16), latent_grid=(8, 8),
        rollout_steps=3, memory=4, batch_size=8,
        model=dataclasses.replace(
            configs.VORTICITY.model, hid_dim=16, n_blocks=2
        ),
    )
    ckpt = os.path.join(tmp_path, "ckpt")
    problem, state, _ = runner.train(
        cfg, epochs=1, ntrain=16, ntest=8, verbose=False, checkpoint_path=ckpt
    )
    server = make_server(cfg, ckpt, host="127.0.0.1", port=0, verbose=False)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        x0 = np.asarray(problem.test_data["x"])[:2]  # (2, L, memory)
        buf = io.BytesIO()
        np.save(buf, x0)
        status, body = _post(base + "/predict", buf.getvalue())
        assert status == 200, body
        pred = np.load(io.BytesIO(body))
        assert pred.shape[0] == 2 and pred.shape[-1] == 3  # horizon
        status, body = _post(
            base + "/predict", buf.getvalue(), rollout_steps=5
        )
        assert status == 200, body
        assert np.load(io.BytesIO(body)).shape[-1] == 5
    finally:
        server.shutdown()
        server.server_close()


def test_serve_per_sample_mesh_mat_upload(tmp_path):
    """Serving a per-sample-geometry benchmark: a .mat upload carrying
    x + mesh predicts like the direct path."""
    from scipy.io import savemat

    from position_induced_transformer_tpu.train.serve import make_server

    cfg = dataclasses.replace(
        configs.ELASTICITY, batch_size=4,
        model=dataclasses.replace(
            configs.ELASTICITY.model, hid_dim=16, n_blocks=2
        ),
    )
    ckpt = os.path.join(tmp_path, "ckpt")
    problem, state, _ = runner.train(
        cfg, epochs=1, ntrain=8, ntest=4, verbose=False,
        checkpoint_path=ckpt, setup_kwargs={"n_points": 48},
    )
    server = make_server(
        cfg, ckpt, host="127.0.0.1", port=0, verbose=False,
        setup_kwargs={"n_points": 48},
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        buf = io.BytesIO()
        savemat(
            buf,
            {
                "x": np.asarray(problem.test_data["x"])[:3],
                "mesh": np.asarray(problem.test_data["mesh"])[:3],
            },
        )
        status, body = _post(base + "/predict", buf.getvalue())
        assert status == 200, body
        pred = np.load(io.BytesIO(body))
        want = runner.predict(
            problem, state,
            data={
                "x": problem.test_data["x"][:3],
                "mesh": problem.test_data["mesh"][:3],
            },
        )
        np.testing.assert_allclose(pred, want, rtol=1e-5, atol=1e-6)
    finally:
        server.shutdown()
        server.server_close()
