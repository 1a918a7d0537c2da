"""Pipeline parallelism: GPipe stage-split of the PiT processor.

The reference has no parallelism at all (SURVEY.md §2.4); DP/TP/SP live in
parallel/sharding.py. This module completes the matrix with the optional
pipeline strategy SURVEY.md §2.4 sketches ("stage split of processor
blocks"): the ``n_blocks`` homogeneous processor layers are divided into
``n_stages`` contiguous stages laid out along a 'stage' mesh axis, and
microbatches stream through the stages GPipe-style — activations hop to
the next stage over ICI with ``jax.lax.ppermute`` while every device works
on a different microbatch.

At PiT model scale pipeline parallelism is never *required* (the latent
bottleneck keeps activations tiny — DP/TP are the production presets);
this is the executable form of the strategy for models whose processor
depth outgrows one chip, and it is numerically identical to the
single-device forward (tests/test_parallel.py).

Layout notes (TPU-first):

- Per-stage parameters are stacked to leaves of shape (S, k, ...) and
  sharded ``P('stage')`` on the leading axis — each device materializes
  only its own stage's slab.
- The processor's k layers per stage run as a ``lax.scan`` (identical
  shapes: hid -> concat (1+H)*hid -> hid), so the schedule compiles to a
  single fused program regardless of depth.
- The encoder/decoder (cross-attention against the fixed latent cloud)
  are replicated: they are O(L) one-shot ops, not the repeated depth-wise
  cost pipeline parallelism addresses.
"""

from __future__ import annotations

import os
import warnings
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, PartitionSpec as P

from position_induced_transformer_tpu.parallel._compat import _shard_map

from position_induced_transformer_tpu.ops.posatt import position_attention



def make_stage_mesh(n_stages: int, devices=None) -> Mesh:
    """A 1-D ('stage',) mesh over the first ``n_stages`` devices."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < n_stages:
        raise ValueError(
            f"stage mesh needs {n_stages} devices but only "
            f"{len(devices)} are available"
        )
    return Mesh(np.array(devices[:n_stages]), ("stage",))


def stack_processor_params(params: Any, n_blocks: int, n_stages: int):
    """Stack the PiT processor layer params (conv_i bandwidth + mlp_i
    weights) into (n_stages, k, ...) leaves for P('stage') sharding."""
    k, rem = divmod(n_blocks, n_stages)
    if rem:
        raise ValueError(
            f"n_blocks={n_blocks} not divisible by n_stages={n_stages}"
        )

    def layer(i):
        return {
            "lmda": params[f"conv_{i}"]["lmda"],
            "w1": params[f"mlp_{i}"]["mlp1"]["kernel"],
            "b1": params[f"mlp_{i}"]["mlp1"]["bias"],
            "w2": params[f"mlp_{i}"]["mlp2"]["kernel"],
            "b2": params[f"mlp_{i}"]["mlp2"]["bias"],
        }

    layers = [layer(i) for i in range(n_blocks)]
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs).reshape((n_stages, k) + xs[0].shape),
        *layers,
    )


def _stage_apply(slab, dist, f):
    """Apply one stage's k processor layers (scan over the layer axis).
    Layer = global self-posatt (concat residual) -> MLP -> GELU, matching
    models/pit.py PiT.processor (reference: pit.py:114-122)."""

    def layer(h, p):
        conv = position_attention(dist, p["lmda"], h, 1.0)
        h = jnp.concatenate([h, conv], axis=-1)
        # params cast to the activations' dtype, mirroring TorchLinear
        # under mixed precision (models/pit.py compute_dtype; f32 = no-op)
        h = h @ p["w1"].astype(h.dtype) + p["b1"].astype(h.dtype)
        h = nn.gelu(h, approximate=False)
        h = h @ p["w2"].astype(h.dtype) + p["b2"].astype(h.dtype)
        return nn.gelu(h, approximate=False), None

    f, _ = jax.lax.scan(layer, f, slab)
    return f


def pipeline_processor(
    mesh: Mesh, stacked, dist_proc, f: jnp.ndarray, n_micro: int
) -> jnp.ndarray:
    """GPipe forward of the stage-stacked processor over the 'stage' axis.

    ``f``: (B, L_ltt, hid) with B divisible by ``n_micro``. Microbatches
    enter stage 0 one per tick; activations hop stage->stage+1 via
    ``ppermute``; the last stage's outputs are gathered with a masked psum
    (every other device contributes zeros).
    """
    S = mesh.shape["stage"]
    B = f.shape[0]
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by n_micro={n_micro}")
    micro = f.reshape((n_micro, B // n_micro) + f.shape[1:])
    perm = [(i, (i + 1) % S) for i in range(S)]

    def device_fn(slab, dist, micro):
        slab = jax.tree_util.tree_map(lambda a: a[0], slab)  # (k, ...)
        stage_id = jax.lax.axis_index("stage")
        buf = jnp.zeros_like(micro[0])
        outs = jnp.zeros_like(micro)

        def tick(carry, t):
            buf, outs = carry
            x_in = jax.lax.dynamic_index_in_dim(
                micro, jnp.clip(t, 0, n_micro - 1), axis=0, keepdims=False
            )
            x = jnp.where(stage_id == 0, x_in, buf)
            y = _stage_apply(slab, dist, x)
            nxt = jax.lax.ppermute(y, "stage", perm)
            o_idx = jnp.clip(t - (S - 1), 0, n_micro - 1)
            upd = jax.lax.dynamic_update_index_in_dim(outs, y, o_idx, 0)
            outs = jnp.where(t >= S - 1, upd, outs)
            return (nxt, outs), None

        (_, outs), _ = jax.lax.scan(
            tick, (buf, outs), jnp.arange(n_micro + S - 1)
        )
        # only the last stage holds real outputs; sum-gather to all devices
        outs = jnp.where(stage_id == S - 1, outs, jnp.zeros_like(outs))
        return jax.lax.psum(outs, "stage")

    out = _shard_map(
        device_fn,
        mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P("stage"), stacked),
            P(),
            P(),
        ),
        out_specs=P(),
    )(stacked, dist_proc, micro)
    return out.reshape(f.shape)


def pipeline_task(task, mesh: Mesh, n_micro: int):
    """A :class:`~..train.loop.Task` whose forward runs the processor
    pipelined over the mesh's 'stage' axis — drop it into
    ``make_train_epoch`` and the whole training loop (loss, grads through
    the ppermute schedule, Adam, cosine step) executes pipeline-parallel.
    """
    import dataclasses

    apply = make_pipelined_apply(task.model, mesh, n_micro)
    return dataclasses.replace(
        task, apply_fn=lambda p, g, b: apply(p, g, b["x"]),
        pp_micro=n_micro,
    )


def _pick_n_micro(batch_size: int, n_stages: int) -> int:
    """Microbatch count for the GPipe schedule.

    Default: ``n_stages`` microbatches when the batch divides evenly —
    the configuration the recorded parity/evidence runs used. When it
    does not divide, fall back to the LARGEST divisor of the batch in
    [2, n_stages] rather than silently running the stages strictly
    serially (n_micro=1 idles K-1 devices every tick and is slower than
    no mesh at all). ``PIT_PP_MICRO`` overrides for tuning — the GPipe
    bubble fraction is (S-1)/(m+S-1), so more microbatches amortize the
    fill/drain at the cost of smaller per-tick matmuls (unmeasured on
    this hardware; hence a knob, not a new default)."""
    env = os.environ.get("PIT_PP_MICRO")
    if env:
        return int(env)
    if batch_size <= 1:
        return 1
    if batch_size % n_stages == 0:
        return n_stages
    for m in range(min(batch_size, n_stages), 1, -1):
        if batch_size % m == 0:
            return m
    warnings.warn(
        f"pipeline batch {batch_size} has no divisor in [2, {n_stages}]; "
        "the GPipe schedule runs with ONE microbatch (stages strictly "
        "sequential — expect no speedup). Pick a batch size divisible "
        "by the stage count.",
        stacklevel=3,
    )
    return 1


def enable_pipeline(problem, state, mesh: Mesh, batch_size: int = 0):
    """Switch a problem onto the GPipe pipeline ('stage=K' mesh spec) —
    the one place the runner, evaluator and infer entry points share.

    Swaps ``problem.task`` for the pipelined one; replicates ``state``,
    the fixed geometry AND the problem's data splits over the pipeline
    mesh (the schedule is a shard_map over its own 1-D mesh, so GSPMD
    data/param sharding is bypassed, and jit arguments must share the
    mesh-wide placement); picks the microbatch count from ``batch_size``
    (:func:`_pick_n_micro`). Returns ``(state, n_micro)``; callers must
    then treat the problem as unsharded (``mesh = None``).
    """
    if getattr(problem.task, "pp_micro", 0):
        raise ValueError(
            "this problem is already pipeline-parallel (enable_pipeline "
            "was called on it before); build a fresh Problem to change "
            "the stage mesh"
        )
    if problem.task.apply_fn is not None or problem.task.geom_fn is not None:
        raise ValueError(
            "pipeline parallelism ('stage=K') supports the torch-family "
            "fixed-mesh PiT benchmarks only (the TF-semantics call "
            "signature and per-sample-mesh geometries are not stage-"
            "splittable)"
        )
    from position_induced_transformer_tpu.parallel.sharding import (
        replicate_tree,
    )

    n_stages = mesh.shape["stage"]
    n_micro = _pick_n_micro(batch_size, n_stages)
    problem.task = pipeline_task(problem.task, mesh, n_micro)
    state = replicate_tree(mesh, state)
    if problem.geom is not None:
        problem.geom = replicate_tree(mesh, problem.geom)
    problem.train_data = replicate_tree(mesh, problem.train_data)
    problem.test_data = replicate_tree(mesh, problem.test_data)
    return state, n_micro


def make_pipelined_apply(model, mesh: Mesh, n_micro: int):
    """(params, geom, x) -> out: the full PiT forward with the processor
    pipelined over the mesh's 'stage' axis (encoder/decoder replicated).
    Mirrors models/pit.py PiT.__call__ exactly (instance norm placement,
    residual output). MAINTENANCE CONTRACT: any new composition flag
    added to PiT.__call__ must be mirrored here, or the pipelined
    forward silently diverges from single-device — extend
    tests/test_parallel.py test_pipeline_with_instance_norm_and_residual
    alongside."""
    from position_induced_transformer_tpu.ops.normalization import (
        instance_norm,
    )

    S = mesh.shape["stage"]

    def apply(params, geom, x):
        if getattr(geom, "dist_proc", None) is None:
            raise ValueError(
                "pipeline parallelism requires a materialized fixed-mesh "
                "geometry (geom.dist_proc is None — lazy/per-sample-mesh "
                "geometries are not supported)"
            )
        stacked = stack_processor_params(params, model.n_blocks, S)
        f = model.apply({"params": params}, geom, x, method=model.encoder)
        if model.use_instance_norm:
            f = instance_norm(f)
        f = pipeline_processor(mesh, stacked, geom.dist_proc, f, n_micro)
        if model.use_instance_norm:
            f = instance_norm(f)
        # f32 model boundary, mirroring PiT.__call__ (compute_dtype)
        out = model.apply(
            {"params": params}, geom, f, method=model.decoder
        ).astype(jnp.float32)
        if model.residual_output:
            out = out + x
        return out

    return apply
