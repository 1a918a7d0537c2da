"""ctypes bindings for the native geometry builder (native/geometry.cpp).

Builds ``libpitgeom.so`` on demand with g++ (cached next to the source) and
falls back to None when no toolchain is available — callers degrade to the
numpy/jnp path transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "native"
)
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libpitgeom.so"))
_METRIC_IDS = {"euclidean": 0, "periodic1d": 1, "periodic2d": 2}

_lock = threading.Lock()
_lib: "ctypes.CDLL | None | bool" = False  # False = not attempted


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "geometry.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=300,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib
    with _lock:
        if _lib is not False:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _lib = None
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _lib = None
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.pit_pairwise_sq_dist.argtypes = [
            f32p, f32p, f32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_float,
        ]
        lib.pit_row_quantile.argtypes = [
            f32p, f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_float
        ]
        lib.pit_geometry.argtypes = [
            f32p, f32p, f32p, f32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ]
        _lib = lib
        return lib


def _f32(x) -> np.ndarray:
    return np.ascontiguousarray(x, dtype=np.float32)


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _period_for(mesh_in: np.ndarray, metric: str) -> float:
    """Domain period inferred exactly as the jnp metrics do
    (ops/distances.py)."""
    if metric == "periodic1d":
        dx = abs(float(mesh_in[1, 0]) - float(mesh_in[0, 0]))
        return dx * mesh_in.shape[0]
    if metric == "periodic2d":
        res = int(round(mesh_in.shape[0] ** 0.5))
        dx = (float(mesh_in[:, 0].max()) - float(mesh_in[:, 0].min())) / (res - 1)
        return dx * res
    return 0.0


def geometry_host_subprocess_many(requests, timeout: float = 600.0):
    """Run several ``geometry_host`` requests in ONE short-lived CHILD
    process; returns a list of (dist, thr) or None on any failure.

    Executing any code in libpitgeom.so inside a TPU-tunnel-attached
    process was observed to degrade that process's device dispatch ~10x
    (mechanism undiagnosed — CLAUDE.md); quarantining the ctypes calls in
    a subprocess keeps the C++ builder usable on the production TPU path.
    The child imports only numpy/ctypes (never jax), and the environment's
    sitecustomize trigger (PALLAS_AXON_POOL_IPS) is stripped so the child
    never registers a second client on the single-chip tunnel relay —
    which contends with, and can wedge, the parent.

    ``requests``: iterable of (mesh_out, mesh_in, metric, locality).
    """
    import pickle
    import subprocess
    import sys
    import tempfile

    if load() is None:  # CDLL load alone is harmless (CLAUDE.md)
        return None
    repo_root = os.path.abspath(os.path.join(_NATIVE_DIR, ".."))
    with tempfile.TemporaryDirectory() as td:
        inp = os.path.join(td, "in.pkl")
        outp = os.path.join(td, "out.pkl")
        with open(inp, "wb") as f:
            pickle.dump(
                [
                    (_f32(mo), _f32(mi), metric, float(loc))
                    for mo, mi, metric, loc in requests
                ],
                f,
            )
        code = (
            "import sys; sys.path.insert(0, sys.argv[1]);"
            "from position_induced_transformer_tpu.data import native;"
            "native._subprocess_main(sys.argv[2], sys.argv[3])"
        )
        env = {
            k: v for k, v in os.environ.items()
            if k != "PALLAS_AXON_POOL_IPS"
        }
        try:
            subprocess.run(
                [sys.executable, "-c", code, repo_root, inp, outp],
                check=True,
                capture_output=True,
                timeout=timeout,
                env=env,
            )
            with open(outp, "rb") as f:
                return pickle.load(f)
        except Exception:
            return None


def _subprocess_main(inp: str, outp: str) -> None:
    """Child entry: run geometry_host on each serialized request."""
    import pickle

    with open(inp, "rb") as f:
        requests = pickle.load(f)
    results = []
    for mesh_out, mesh_in, metric, locality in requests:
        r = geometry_host(mesh_out, mesh_in, metric, locality)
        if r is None:
            raise SystemExit(3)
        results.append(r)
    with open(outp, "wb") as f:
        pickle.dump(results, f)


def geometry_host(
    mesh_out,
    mesh_in,
    metric: str = "euclidean",
    locality: float = 1.0,
):
    """(dist, thr) on host via the native builder; None if unavailable.

    ``thr`` is None when ``locality >= 1`` (global attention).
    """
    lib = load()
    if lib is None:
        return None
    a = _f32(mesh_out)
    b = _f32(mesh_in)
    la, lb = a.shape[0], b.shape[0]
    dist = np.empty((la, lb), np.float32)
    masked = 0.0 <= locality < 1.0
    thr = np.empty((la, 1), np.float32) if masked else None
    lib.pit_geometry(
        _ptr(a), _ptr(b), _ptr(dist),
        _ptr(thr) if masked else _ptr(dist),  # dummy ptr when unused
        la, lb, a.shape[1], _METRIC_IDS[metric],
        _period_for(b, metric), locality if masked else 2.0,
    )
    return dist, thr
