"""HTTP model server: a warm checkpoint behind a tiny REST surface.

The deployment complement to the one-shot ``infer`` CLI: the checkpoint
is restored and the forward jitted ONCE at startup (optionally warmed),
then every request reuses the compiled executable — the property a
serving process needs on TPU, where an eager or per-process compile costs
seconds to minutes. The reference has no serving story at all (its
evaluate scripts are batch jobs over the benchmark test split).

Protocol (stdlib-only, binary-friendly):

- ``GET  /health``  -> ``{"status": "ok", "benchmark": ..., "requests": N}``
- ``GET  /info``    -> benchmark/model configuration summary
- ``POST /predict`` -> request body is a ``.npy``, ``.mat`` or ``.h5``
  input batch, exactly the files ``infer --input`` accepts (RAW physical
  values; per-sample-geometry benchmarks include their coordinate
  variables in the same file). The format is sniffed from the magic
  bytes. Query parameters: ``key`` (input variable, default ``x``),
  ``rollout_steps`` (autoregressive horizon override), ``batch_size``.
  Response body: the predictions as ``.npy`` bytes (or a ``.mat`` with
  variable ``pred`` when ``format=mat``).

Device execution runs on a single worker thread (one device, one
compiled model) with DYNAMIC BATCHING: shape-compatible concurrent
requests are concatenated into one device call — N clients posting
single samples cost ~one dispatch, not N (each dispatch pays a fixed
floor on TPU). Scale beyond one device's throughput at the replica
level.
"""

from __future__ import annotations

import io
import json
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

# magic-byte -> temp-file suffix, routing the body through the same
# loaders the CLI uses (data/loaders.load_mat for both .mat generations,
# native-layout h5py for plain HDF5 — see evaluate._load_table)
_MAGIC = (
    (b"\x93NUMPY", ".npy"),
    (b"MATLAB", ".mat"),  # v5 .mat header text
    (b"\x89HDF\r\n\x1a\n", ".h5"),
)


def _sniff_suffix(body: bytes) -> str:
    for magic, suffix in _MAGIC:
        if body.startswith(magic):
            return suffix
    raise ValueError(
        "unrecognized input payload: expected .npy bytes, a MATLAB .mat "
        "file, or an HDF5 file"
    )


class _Request:
    __slots__ = ("data", "steps", "batch_size", "done", "result", "error")

    def __init__(self, data, steps, batch_size):
        self.data = data
        self.steps = steps
        self.batch_size = batch_size
        self.done = threading.Event()
        self.result = None
        self.error = None

    def key(self):
        # coalescible iff same rollout horizon / batch override, same
        # variable set and same per-sample shapes (batch axes may differ)
        return (
            self.steps,
            self.batch_size,
            tuple(
                (k, tuple(np.shape(v)[1:]))
                for k, v in sorted(self.data.items())
            ),
        )


class _Batcher:
    """Dynamic request batching: concurrent /predict requests whose
    samples are shape-compatible are concatenated into ONE device call.

    On TPU each dispatch pays a fixed floor (milliseconds through a
    relay), so N concurrent single-sample requests cost ~N floors served
    naively but ~1 when coalesced — the standard inference-server trade
    of a tiny queuing window for device efficiency. The worker drains
    whatever is queued when it becomes free (natural batching under
    load: no artificial delay when idle, full coalescing when busy)."""

    def __init__(self, predictor):
        self.predictor = predictor
        self._queue: list[_Request] = []
        self._cv = threading.Condition()
        self.n_calls = 0  # device-call count (vs server.n_requests)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def predict(self, data, steps, batch_size) -> np.ndarray:
        req = _Request(data, steps, batch_size)
        with self._cv:
            self._queue.append(req)
            self._cv.notify()
        req.done.wait()
        if req.error is not None:
            raise req.error
        return req.result

    def _worker(self):
        while True:
            with self._cv:
                while not self._queue:
                    self._cv.wait()
                batch, self._queue = self._queue, []
            try:
                self._run_batch(batch)
            except BaseException as e:  # noqa: BLE001 — the singleton
                # worker must never die: a failure outside the per-group
                # try (e.g. MemoryError while grouping) would otherwise
                # leave every current AND future request blocked forever
                # on done.wait() while /health still reports ok
                for r in batch:
                    if not r.done.is_set():
                        r.error = r.error or e
                        r.done.set()

    def _run_batch(self, batch):
        groups: dict = {}
        for r in batch:
            groups.setdefault(r.key(), []).append(r)
        for reqs in groups.values():
            try:
                if len(reqs) == 1:
                    data, offsets = reqs[0].data, [0]
                else:
                    keys = reqs[0].data.keys()
                    data = {
                        k: np.concatenate(
                            [np.asarray(r.data[k]) for r in reqs]
                        )
                        for k in keys
                    }
                    offsets = np.cumsum(
                        [0] + [r.data["x"].shape[0] for r in reqs]
                    )[:-1]
                out = self.predictor.predict_array(
                    data, reqs[0].steps, reqs[0].batch_size
                )
                # actual device dispatches: the coalesced group runs in
                # ceil(n / serving-batch) padded batches
                bs = self.predictor._batch_size(reqs[0].batch_size)
                self.n_calls += -(-int(data["x"].shape[0]) // bs)
                for r, start in zip(reqs, offsets):
                    r.result = out[start : start + r.data["x"].shape[0]]
            except Exception as e:  # delivered to every waiter
                for r in reqs:
                    r.error = e
            finally:
                for r in reqs:
                    r.done.set()


class PredictHandler(BaseHTTPRequestHandler):
    # set on the server: predictor, lock, counters
    server: "PredictServer"

    def log_message(self, fmt, *args):  # route through server verbosity
        if self.server.verbose:
            BaseHTTPRequestHandler.log_message(self, fmt, *args)

    def _reply(self, code: int, body: bytes, content_type: str):
        self.send_response(code)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _reply_json(self, code: int, obj: dict):
        self._reply(
            code, json.dumps(obj).encode(), "application/json"
        )

    def do_GET(self):
        path = urlparse(self.path).path
        srv = self.server
        if path == "/health":
            self._reply_json(
                200,
                {
                    "status": "ok",
                    "benchmark": srv.predictor.cfg.name,
                    "requests": srv.n_requests,
                    # < requests under concurrent load: dynamic batching
                    "device_calls": srv.batcher.n_calls,
                },
            )
        elif path == "/info":
            cfg = srv.predictor.cfg
            m = cfg.model
            self._reply_json(
                200,
                {
                    "benchmark": cfg.name,
                    "model_variant": getattr(cfg, "model_variant", "pit"),
                    "hid_dim": m.hid_dim,
                    "n_head": m.n_head,
                    "n_blocks": m.n_blocks,
                    "in_dim": m.in_dim,
                    "out_dim": m.out_dim,
                    "rollout_steps": cfg.rollout_steps,
                    "input_shape": [
                        int(s)
                        for s in np.shape(
                            srv.predictor.problem.test_data["x"]
                        )[1:]
                    ],
                },
            )
        else:
            self._reply_json(404, {"error": f"unknown path {path!r}"})

    def do_POST(self):
        parsed = urlparse(self.path)
        if parsed.path != "/predict":
            self._reply_json(404, {"error": f"unknown path {parsed.path!r}"})
            return
        srv = self.server
        try:
            # ---- request parsing/validation: failures here are 400s ----
            length = int(self.headers.get("Content-Length", 0))
            max_body = srv.max_body_bytes
            if length > max_body:
                self._reply_json(
                    413,
                    {"error": f"payload {length} bytes exceeds the "
                     f"{max_body}-byte limit (PIT_SERVE_MAX_BODY)"},
                )
                return
            body = self.rfile.read(length)
            q = {k: v[-1] for k, v in parse_qs(parsed.query).items()}
            key = q.get("key", "x")
            steps = (
                int(q["rollout_steps"]) if "rollout_steps" in q else None
            )
            cfg = srv.predictor.cfg
            if steps is not None:
                # each distinct horizon is a static jit argument => a
                # fresh XLA compile serialized behind the worker thread;
                # bound it so a client can't compile-storm the server
                max_steps = srv.max_rollout_steps
                if steps < 0 or steps > max_steps:
                    raise ValueError(
                        f"rollout_steps must be in [0, {max_steps}] "
                        f"(PIT_SERVE_MAX_ROLLOUT), got {steps}"
                    )
            bs = int(q["batch_size"]) if "batch_size" in q else None
            if bs is not None and bs < 1:
                raise ValueError(f"batch_size must be >= 1, got {bs}")
            out_fmt = q.get("format", "npy")
            if out_fmt not in ("npy", "mat"):
                raise ValueError(f"unknown output format {out_fmt!r}")
            suffix = _sniff_suffix(body)
            with tempfile.NamedTemporaryFile(suffix=suffix) as f:
                f.write(body)
                f.flush()
                data = srv.predictor.prepare_file(f.name, key)
            if int(np.shape(data["x"])[0]) < 1:
                raise ValueError("input batch is empty (0 samples)")
            if steps is None:
                steps = cfg.rollout_steps
        except Exception as e:
            # bad payloads surface as ValueError/KeyError but also
            # OSError (h5py on truncated files), TypeError, scipy
            # NotImplementedError, ... — all client errors here
            import traceback

            if srv.verbose:
                traceback.print_exc()
            self._reply_json(400, {"error": f"{type(e).__name__}: {e}"})
            return
        try:
            # ---- device execution: failures here are server errors ----
            # the batcher's worker thread serializes device calls and
            # coalesces shape-compatible concurrent requests into one
            pred = srv.batcher.predict(data, steps, bs)
            with srv.lock:
                srv.n_requests += 1
        except Exception as e:
            # device/relay failures are retryable 500s, NOT 400s — a
            # load balancer must not blame the client for an outage
            import traceback

            if srv.verbose:
                traceback.print_exc()
            self._reply_json(500, {"error": f"{type(e).__name__}: {e}"})
            return
        buf = io.BytesIO()
        if out_fmt == "mat":
            from scipy.io import savemat

            savemat(buf, {"pred": pred})
            self._reply(200, buf.getvalue(), "application/octet-stream")
        else:
            np.save(buf, pred)
            self._reply(200, buf.getvalue(), "application/octet-stream")


class PredictServer(ThreadingHTTPServer):
    """ThreadingHTTPServer carrying the warm Predictor (+ request lock)."""

    daemon_threads = True

    def __init__(self, addr, predictor, verbose: bool = True):
        import os

        super().__init__(addr, PredictHandler)
        self.predictor = predictor
        self.lock = threading.Lock()  # counters only; the batcher's
        # worker thread serializes device execution
        self.batcher = _Batcher(predictor)
        self.n_requests = 0
        self.verbose = verbose
        self.max_body_bytes = int(
            os.environ.get("PIT_SERVE_MAX_BODY", str(512 * 1024 * 1024))
        )
        self.max_rollout_steps = int(
            os.environ.get(
                "PIT_SERVE_MAX_ROLLOUT",
                str(max(100, 4 * predictor.cfg.rollout_steps)),
            )
        )


def make_server(
    config,
    checkpoint_path: str,
    host: str = "127.0.0.1",
    port: int = 8765,
    warmup: bool = True,
    verbose: bool = True,
    data_path: Optional[str] = None,
    setup_kwargs: Optional[dict] = None,
    mesh=None,
    model_variant: Optional[str] = None,
) -> PredictServer:
    """Build the server (bound, not yet serving — call ``serve_forever``).

    ``warmup=True`` compiles the forward at the serving batch size before
    the first request, using the benchmark's own (synthetic) sample
    layout — first-request latency then excludes XLA compilation.
    """
    from position_induced_transformer_tpu.train.evaluate import Predictor

    predictor = Predictor(
        config, checkpoint_path, data_path=data_path,
        setup_kwargs=setup_kwargs, mesh=mesh, model_variant=model_variant,
    )
    if warmup:
        import jax

        problem = predictor.problem
        # warm with the REQUEST-path pytree structure: x plus only the
        # coordinate variables geom_fn requires. Optional extras
        # (thr_* thresholds, plot-only meshes) are absent from a minimal
        # upload, and a different key set would be a different jit
        # pytree — the warmed executable would never be reused.
        keys = {"x"} | set(predictor.required_keys)
        data = {k: v for k, v in problem.test_data.items() if k in keys}
        n = int(np.shape(data["x"])[0])
        # tile the benchmark sample up to the SERVING batch size, so the
        # compiled shape matches what full-size requests will use
        cfg = predictor.cfg
        bs = predictor._batch_size(None)
        idx = np.minimum(np.arange(bs), n - 1)
        # HOST-side batch: requests arrive as host numpy from
        # prepare_file, and an executable compiled against
        # device-committed (or mesh-replicated) inputs is a DIFFERENT
        # jit specialization — warming with committed test_data both
        # dispatched eager on-device gathers at startup and compiled an
        # executable the first real request couldn't reuse
        batch = jax.tree_util.tree_map(lambda a: np.asarray(a)[idx], data)
        predictor.predict_array(batch, cfg.rollout_steps)
    return PredictServer((host, port), predictor, verbose=verbose)


def serve(config, checkpoint_path: str, **kwargs) -> None:
    """Blocking entry point behind the ``serve`` CLI subcommand."""
    server = make_server(config, checkpoint_path, **kwargs)
    host, port = server.server_address[:2]
    name = server.predictor.cfg.name
    print(
        f"serving benchmark {name!r} on http://{host}:{port} "
        "(POST /predict, GET /health, GET /info)",
        flush=True,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
