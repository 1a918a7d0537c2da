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


def _batch_axis(arg_infos, batch_ops):
    """The mesh axis (or None) the caller sharded the batch dimension over,
    read from the first batch-carrying operand that has one. Shardings
    without a decodable ``spec`` (e.g. GSPMDSharding supplied when no
    named mesh is available) degrade to 'unsharded' instead of crashing —
    an AttributeError here aborts the whole process under the legacy
    GSPMD partitioner."""
    for i, a in enumerate(arg_infos):
        spec = getattr(a.sharding, "spec", None) or ()
        if i in batch_ops and len(spec) and spec[0] is not None:
            return spec[0]
    return None


def _batch_operands(rule: str) -> frozenset:
    """Operand indices whose FIRST factor in the Shardy rule is the batch
    factor 'b' — the single source of truth for which operands carry the
    batch dimension (rather than a rank heuristic, which would misclassify
    a future rank-2 batch-leading operand as a batch-free scale)."""
    lhs = rule.split("->")[0]
    return frozenset(
        i
        for i, factors in enumerate(
            part.split() for part in lhs.split(",")
        )
        if factors and factors[0] == "b"
    )


def batch_partitioned(fn, rule: str, static_argnums):
    """Wrap ``fn(*arrays, *statics)`` — a batch-parallel kernel caller
    whose batch-carrying operands (those whose rule entry leads with the
    'b' factor) and ALL outputs are batch-leading; the remaining operands
    (the bandwidth scales) are batch-free — in a custom_partitioning with
    batch-dimension propagation.

    ``rule`` is the Shardy einsum-like sharding rule for the exact operand
    arity. Factor 'b' marks the batch dimension; non-batch factors MAY
    repeat across operands (they describe the shapes, e.g. 'li'/'lo'/'d'),
    so under Shardy a user sharding of a non-batch dimension can propagate
    between operands — the partition callback then force-replicates every
    non-batch dimension at lowering (inserting the reshard), keeping the
    kernel call per-shard identical to the single-device one.
    """
    cp = custom_partitioning(fn, static_argnums=tuple(static_argnums))
    batch_ops = _batch_operands(rule)

    def _result_shardings(mesh, axis, result_infos):
        if isinstance(result_infos, (tuple, list)):
            return tuple(
                _batch_sharded(mesh, axis, r.ndim) for r in result_infos
            )
        return _batch_sharded(mesh, axis, result_infos.ndim)

    def infer(*cb_args):
        # static args are PREPENDED to every callback's signature
        mesh, arg_infos, result_infos = cb_args[-3], cb_args[-2], cb_args[-1]
        return _result_shardings(
            mesh, _batch_axis(arg_infos, batch_ops), result_infos
        )

    def partition(*cb_args):
        statics = cb_args[:-3]
        mesh, arg_infos, result_infos = cb_args[-3], cb_args[-2], cb_args[-1]
        axis = _batch_axis(arg_infos, batch_ops)
        arg_shardings = tuple(
            _batch_sharded(mesh, axis, a.ndim)
            if i in batch_ops
            else _replicated(mesh, a.ndim)  # bandwidth scales: batch-free
            for i, a in enumerate(arg_infos)
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
