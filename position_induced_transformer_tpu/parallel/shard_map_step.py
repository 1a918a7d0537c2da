"""Explicit-collective data-parallel training step via shard_map.

The GSPMD path (parallel/sharding.py + train/loop.py) lets XLA place the
collectives; this module spells them out — each device computes the loss
and gradients for its batch shard, gradients are summed with ``psum`` over
the 'data' mesh axis on ICI, and the (replicated) optimizer update is
applied identically everywhere. Useful when collective placement must be
explicit (multi-slice DCN vs ICI, custom overlap) and as executable
documentation of the communication pattern; numerically identical to the
single-device step (tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from position_induced_transformer_tpu.parallel._compat import _shard_map
from position_induced_transformer_tpu.train.loop import Task, TrainState


def make_shard_map_train_step(
    task: Task, optimizer: optax.GradientTransformation, mesh: Mesh
):
    """Jitted (state, geom, batch) -> (state, loss) with batch sharded over
    the 'data' axis and explicit psum gradient reduction.

    The batch-summed reference loss convention (ops/metrics.py) makes the
    reduction a plain sum: psum over shards == loss over the global batch.

    On a multi-slice ('dcn', 'data', ...) mesh the reduction is staged
    explicitly: psum over 'data' first (intra-slice, rides ICI at full
    bandwidth), then psum over 'dcn' (one inter-slice all-reduce of the
    already-reduced gradients crossing the data-center network) — the
    scaling-book two-level all-reduce the GSPMD path leaves to XLA.
    """
    dcn = "dcn" in mesh.shape
    batch_spec = P(("dcn", "data")) if dcn else P("data")
    replicated = P()

    def device_step(params, opt_state, geom, batch):
        # per-shard loss/grads (batch leaves carry the leading shard)
        loss, grads = jax.value_and_grad(task.loss_fn)(params, geom, batch)
        # gradient + loss all-reduce: ICI first, then (multi-slice) DCN
        grads = jax.lax.psum(grads, axis_name="data")
        loss = jax.lax.psum(loss, axis_name="data")
        if dcn:
            grads = jax.lax.psum(grads, axis_name="dcn")
            loss = jax.lax.psum(loss, axis_name="dcn")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if task.param_constraint is not None:
            # keras constraint semantics: project after every update,
            # identically on every device (train/loop.py does the same)
            params = task.param_constraint(params)
        return params, opt_state, loss

    def spec_like(tree, spec):
        return jax.tree_util.tree_map(lambda _: spec, tree)

    @jax.jit
    def train_step(state: TrainState, geom, batch):
        fn = _shard_map(
            device_step,
            mesh,
            in_specs=(
                spec_like(state.params, replicated),
                spec_like(state.opt_state, replicated),
                spec_like(geom, replicated),
                spec_like(batch, batch_spec),
            ),
            out_specs=(
                spec_like(state.params, replicated),
                spec_like(state.opt_state, replicated),
                replicated,
            ),
        )
        params, opt_state, loss = fn(
            state.params, state.opt_state, geom, batch
        )
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def shard_batch_arrays(mesh: Mesh, batch):
    """Place a batch dict with its leading axis sharded over 'data' (and
    the outer 'dcn' axis on a multi-slice mesh). Same spec as
    :func:`..sharding.batch_spec` — device placement here, in-jit
    constraint there."""
    from position_induced_transformer_tpu.parallel.sharding import batch_spec

    dcn = "dcn" in mesh.shape
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, batch_spec(a, dcn))
        ),
        batch,
    )
