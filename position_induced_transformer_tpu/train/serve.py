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

Requests are serialized through a lock: one device, one compiled model —
concurrency belongs at the replica level, not inside a process.
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
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            q = {k: v[-1] for k, v in parse_qs(parsed.query).items()}
            key = q.get("key", "x")
            steps = (
                int(q["rollout_steps"]) if "rollout_steps" in q else None
            )
            bs = int(q["batch_size"]) if "batch_size" in q else None
            out_fmt = q.get("format", "npy")
            if out_fmt not in ("npy", "mat"):
                raise ValueError(f"unknown output format {out_fmt!r}")
            suffix = _sniff_suffix(body)
            with tempfile.NamedTemporaryFile(suffix=suffix) as f:
                f.write(body)
                f.flush()
                with srv.lock:  # one device, one compiled model
                    pred = srv.predictor.predict_file(
                        f.name, key, rollout_steps=steps, batch_size=bs
                    )
                    srv.n_requests += 1
        except (ValueError, KeyError) as e:
            self._reply_json(400, {"error": str(e)})
            return
        except Exception as e:
            # anything else (truncated/odd payloads raise OSError from
            # h5py, TypeError from group-valued keys, scipy
            # NotImplementedError, ...) must still produce an HTTP error
            # instead of a dropped connection
            import traceback

            if srv.verbose:
                traceback.print_exc()
            self._reply_json(
                400, {"error": f"{type(e).__name__}: {e}"}
            )
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
        super().__init__(addr, PredictHandler)
        self.predictor = predictor
        self.lock = threading.Lock()
        self.n_requests = 0
        self.verbose = verbose


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
        bs = predictor._batch_size(cfg.eval_batch_size or cfg.batch_size, None)
        idx = np.minimum(np.arange(bs), n - 1)
        batch = jax.tree_util.tree_map(lambda a: a[idx], data)
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
