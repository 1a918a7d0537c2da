"""Multi-host (multi-process) production entry.

The reference is single-process, single-GPU (SURVEY.md §2.4: ``.cuda()``
everywhere, no distributed backend of any kind). A TPU pod runs one JAX
process per host; after ``jax.distributed.initialize`` wires the
coordination service, ``jax.devices()`` is the GLOBAL device list, so the
runner's existing ``--mesh data=N[,model=M][,dcn=K]`` presets span hosts
unchanged: GSPMD inserts the same collectives, riding ICI within a slice
and DCN across the 'dcn' axis (parallel/sharding.py make_mesh).

Measured (tests/test_parallel.py test_multihost_two_process_*): a
two-process CPU cluster (gloo collectives) training through
``runner.train(mesh='data=2')`` reproduces the single-process loss
bit-for-bit with NO runner changes — cross-process ``device_put`` and the
jitted epoch scan are already process-count-agnostic. What this module
adds is the thin entry + the per-process conventions:

- every process calls the same CLI/runner invocation with IDENTICAL
  config/seed/data (synthetic generators are seed-deterministic; real
  datasets must be readable from every host). Epoch shuffles derive from
  the config seed via ``fold_in``, so all processes compute identical
  permutations without communication;
- orbax checkpointing is collective — every process participates in
  ``save`` and the checkpoint path must be a shared filesystem on real
  pods (single-host multi-process shares /tmp in tests);
- stdout/JSONL/artifact writes are gated to process 0 (:func:`is_main`).
"""

from __future__ import annotations

from typing import Optional


def initialize(spec: Optional[str] = "auto") -> None:
    """Join (or bootstrap) the multi-process JAX cluster.

    ``spec``:
      - ``'auto'`` — ``jax.distributed.initialize()`` with no arguments:
        on Cloud TPU pods the coordinator address, process count and
        process id come from the TPU metadata server (the standard
        one-process-per-host launch);
      - ``'coordinator=HOST:PORT,num_processes=N,process_id=I'`` —
        explicit wiring for clusters without autodetection (also what the
        multi-process CPU tests use).

    Must run before any JAX backend initializes (i.e. before the first
    array/device call in the process); the CLI calls it first thing.
    """
    import jax

    if spec is None or spec == "auto":
        jax.distributed.initialize()
        return
    kw: dict = {}
    for part in str(spec).split(","):
        key, sep, val = part.partition("=")
        key, val = key.strip(), val.strip()
        if not sep or key not in (
            "coordinator", "num_processes", "process_id",
        ):
            raise ValueError(
                f"bad --multihost component {part!r}; expected "
                "'auto' or 'coordinator=HOST:PORT,num_processes=N,"
                "process_id=I'"
            )
        if key == "coordinator":
            kw["coordinator_address"] = val
        else:
            kw[key] = int(val)
    missing = {"coordinator_address", "num_processes", "process_id"} - set(kw)
    if missing:
        raise ValueError(
            f"--multihost spec is missing {sorted(missing)} "
            f"(got {spec!r})"
        )
    jax.distributed.initialize(**kw)


def is_main() -> bool:
    """True on the process that should write logs/artifacts (process 0;
    trivially true single-process)."""
    import jax

    return jax.process_index() == 0
