"""Benchmark: Burgers-config training throughput on the default backend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured quantity is full training steps/second (forward + backward +
Adam + cosine LR) at the reference Burgers configuration
(L=1024 -> latent 256, hid 64, 2 heads, 5 blocks, batch 8 —
reference: train_burgers.py:51-78). ``vs_baseline`` is the ratio against
the torch reference implementation executing the same step on this host's
CPU (measured by scripts/measure_torch_baseline.py and recorded in
BASELINE.md; the reference repo publishes no numbers of its own).
"""

import json
import os
import sys
import time

# Baseline: torch-2.13-CPU reference train-step throughput on this host
# (see BASELINE.md "Measured baselines").
TORCH_CPU_STEPS_PER_SEC = None  # filled from BASELINE_local.json when present


def _load_local_baseline():
    path = os.path.join(os.path.dirname(__file__), "BASELINE_local.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f).get("torch_cpu_steps_per_sec")
    return None


_STAGE = {"stage": "import"}


def _watchdog(timeout_s: float):
    """Emit the one JSON line and exit if the bench stalls.

    The TPU relay has been observed to hang device discovery indefinitely
    (jax.devices() blocked > 10 min, 2026-08-17); without a watchdog the
    driver's round-end bench would stall with no record at all. The error
    line keeps the one-JSON-line contract and names the stage reached."""
    import threading

    def fire():
        print(
            json.dumps(
                {
                    "metric": "burgers_train_steps_per_sec",
                    "value": 0.0,
                    "unit": "steps/s",
                    "vs_baseline": None,
                    "error": (
                        f"watchdog: not finished after {timeout_s:.0f}s, "
                        f"stalled at stage {_STAGE['stage']!r} (TPU relay "
                        "unreachable/degraded?)"
                    ),
                }
            ),
            flush=True,
        )
        os._exit(3)

    t = threading.Timer(timeout_s, fire)
    t.daemon = True
    t.start()
    return t


def _default_backend_usable(timeout_s: float, attempts: int = 2) -> bool:
    """Execute one tiny op on the default backend in a SUBPROCESS with a
    hard timeout. TPU-relay device discovery has been observed to hang
    indefinitely (2026-08-17 outage); probing in a child means a hung
    relay cannot take the bench process with it, and the bench can fall
    back to an honestly-labeled CPU measurement instead of recording
    nothing. The timeout accommodates the degraded-relay regime (trivial
    remote compile observed at ~190 s). The relay also FLAPS on the
    minute scale (2026-08-20: probe ok at 04:41:35, probe hung seconds
    later, healthy again by 05:03), so a single failed probe retries
    once after a pause before condemning the backend."""
    import subprocess

    env = dict(os.environ)
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((4, 4));"
        "print(float((x @ x).sum()))"
    )
    for attempt in range(attempts):
        if attempt:
            time.sleep(30.0)
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], timeout=timeout_s, env=env,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


def main():
    os.environ.setdefault("JAX_PLATFORMS", "")
    wd = _watchdog(float(os.environ.get("PIT_BENCH_TIMEOUT", "1500")))
    _STAGE["stage"] = "backend_probe"
    fallback_note = None
    if not _default_backend_usable(
        float(os.environ.get("PIT_BENCH_PROBE_TIMEOUT", "300"))
    ):
        fallback_note = (
            "default (TPU) backend unusable — relay unreachable/hung; "
            "measured on the host CPU backend instead"
        )
    import jax
    import jax.numpy as jnp

    if fallback_note:
        jax.config.update("jax_platforms", "cpu")
    _STAGE["stage"] = "backend_init"
    jax.devices()  # force device discovery under the watchdog

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import dataclasses

    from position_induced_transformer_tpu import configs
    from position_induced_transformer_tpu.train import (
        benchmarks,
        runner,
    )
    from position_induced_transformer_tpu.train.loop import (
        epoch_permutation,
        make_optimizer,
        make_train_epoch,
    )

    cfg = configs.BURGERS
    ntrain, batch = 256, cfg.batch_size
    _STAGE["stage"] = "setup"
    problem = benchmarks.setup(cfg, ntrain=ntrain, ntest=batch)
    n_batches = ntrain // batch

    optimizer = make_optimizer(cfg.lr, 500 * n_batches)
    state = runner.init_state(problem, optimizer, seed=0)
    train_epoch = make_train_epoch(problem.task, optimizer)

    perm = epoch_permutation(0, ntrain, batch)
    # compile + warm up
    _STAGE["stage"] = "compile"
    state, loss = jax.block_until_ready(train_epoch(state, problem.geom, problem.train_data, perm))
    # timed epochs
    _STAGE["stage"] = "timed_epochs"
    n_epochs = 15
    t0 = time.perf_counter()
    for i in range(n_epochs):
        perm = epoch_permutation(i + 1, ntrain, batch)
        state, loss = train_epoch(state, problem.geom, problem.train_data, perm)
    # a scalar D2H read is the only reliable completion barrier through
    # the TPU tunnel (jax.block_until_ready can return early — CLAUDE.md);
    # loss depends on every step of the last epoch, which depends on all
    # prior epochs through the donated state
    float(loss)
    dt = time.perf_counter() - t0
    steps_per_sec = n_epochs * n_batches / dt

    wd.cancel()
    baseline = _load_local_baseline()
    vs = steps_per_sec / baseline if baseline else None
    record = {
        "metric": "burgers_train_steps_per_sec",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(vs, 3) if vs else None,
        "backend": jax.devices()[0].platform,
        "final_loss": float(loss) / ntrain,
    }
    if fallback_note:
        record["note"] = fallback_note
    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main())
