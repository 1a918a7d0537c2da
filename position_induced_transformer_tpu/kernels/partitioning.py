"""SPMD partitioning rules for the batched (per-sample-mesh) Pallas kernels.

The batched position-attention kernels (kernels/posatt_batched.py) are pure
batch-parallel maps: every operand except the (H, 1) bandwidth scales has a
leading batch dimension, and so does every output (the scale gradient is
returned per-sample (B, H) and reduced OUTSIDE the kernel). Under the
production data-parallel mesh (``runner.train(mesh='data=N')`` shards the
batch over 'data' with GSPMD) a Mosaic custom call has no built-in SPMD
partitioning rule, so without an explicit rule the partitioner would have
to gather the full batch onto every device (or refuse to compile) —
defeating data parallelism exactly on the benchmarks where the fused
kernels are the production win (NACA 2.75x, elasticity 1.37x, BASELINE.md).

``batch_partitioned`` wraps a kernel entry point in
:func:`jax.experimental.custom_partitioning.custom_partitioning` declaring
the only sensible partitioning: shard the batch dimension (propagated from
whichever operand the user sharded), replicate everything else, and lower
each shard as the unmodified single-device kernel call. Works under both
the Shardy (``sharding_rule``) and legacy-GSPMD (callback) partitioners.

The reference is strictly single-GPU (SURVEY.md §2.4) — this file exists
because the TPU-native framework promises multi-chip execution of the same
models.
"""

from __future__ import annotations

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _replicated(mesh, ndim):
    return NamedSharding(mesh, P(*([None] * ndim)))


def _batch_sharded(mesh, axis, ndim):
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def _batch_axis(arg_infos):
    """The mesh axis (or None) the caller sharded the batch dimension over,
    read from the first batch-carrying (rank >= 3) operand that has one."""
    for a in arg_infos:
        spec = a.sharding.spec if a.sharding is not None else ()
        if a.ndim >= 3 and len(spec) and spec[0] is not None:
            return spec[0]
    return None


def batch_partitioned(fn, rule: str, static_argnums):
    """Wrap ``fn(*arrays, *statics)`` — a batch-parallel kernel caller whose
    rank-3+ operands and ALL outputs are batch-leading and whose rank-2
    operands (the bandwidth scales) are batch-free — in a
    custom_partitioning with batch-dimension propagation.

    ``rule`` is the Shardy einsum-like sharding rule for the exact operand
    arity (factor 'b' = the batch dimension; all other factors unique so
    nothing else co-propagates — the partition callback replicates them
    regardless).
    """
    cp = custom_partitioning(fn, static_argnums=tuple(static_argnums))

    def _result_shardings(mesh, axis, result_infos):
        if isinstance(result_infos, (tuple, list)):
            return tuple(
                _batch_sharded(mesh, axis, r.ndim) for r in result_infos
            )
        return _batch_sharded(mesh, axis, result_infos.ndim)

    def infer(*cb_args):
        # static args are PREPENDED to every callback's signature
        mesh, arg_infos, result_infos = cb_args[-3], cb_args[-2], cb_args[-1]
        return _result_shardings(mesh, _batch_axis(arg_infos), result_infos)

    def partition(*cb_args):
        statics = cb_args[:-3]
        mesh, arg_infos, result_infos = cb_args[-3], cb_args[-2], cb_args[-1]
        axis = _batch_axis(arg_infos)
        arg_shardings = tuple(
            _replicated(mesh, a.ndim)
            if a.ndim <= 2  # bandwidth scales: no batch dimension
            else _batch_sharded(mesh, axis, a.ndim)
            for a in arg_infos
        )

        def lower(*arrays):
            return fn(*arrays, *statics)

        return (
            mesh,
            lower,
            _result_shardings(mesh, axis, result_infos),
            arg_shardings,
        )

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
    )
    return cp
